"""Device kernels for the multilinear hot loops (round-3 VERDICT #4).

The reference makes big multilinear proving fast with packed split-eq
kernels and the SVO accumulator machinery
(`multilinear-util/src/split_eq/packed_kernel.rs:1`, `eq_batch.rs:1`,
`sumcheck/src/svo/mod.rs:1-15`) — CPU-scalar-loop engineering. The TPU
replacement is plain whole-array arithmetic: every table is one (N, D)
Monty ext array, a sumcheck round is one jitted program (affine
extension + product + modular tree-sum), and the weighted eq table for
C batched constraints builds as one log-depth broadcast kernel over a
(C, nv, D) point tensor. These kernels back both the WHIR prover
(multilinear/whir.py) and the zerocheck (multilinear/sumcheck.py).

All shapes are static per call site; `jax.jit` caches one executable per
(shape, E) and the persistent compile cache keeps recompiles off CI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("E",))
def fold_at(E, table, r_m):
    """(2m, D) ext table -> (m, D): even + r·(odd - even)."""
    m = table.shape[0] // 2
    v = table.reshape(m, 2, E.D)
    even, odd = v[:, 0], v[:, 1]
    return E.add(even, E.mul(E.sub(odd, even), r_m))


@partial(jax.jit, static_argnames=("E",))
def round_poly_012(E, evals, w):
    """Quadratic sumcheck round evaluations (s(0), s(1), s(2)) of
    Σ_x f(x)·w(x) over the lowest variable, as a (3, D) array.

    s(2) uses the affine extrapolation g(2) = 2·g(1) - g(0)
    (sumcheck/src/strategy.rs round_coefficients semantics, evaluated at
    points instead of (c0, c_inf) coefficients)."""
    F = E.base
    m = evals.shape[0] // 2
    g = evals.reshape(m, 2, E.D)
    wv = w.reshape(m, 2, E.D)
    g0, g1 = g[:, 0], g[:, 1]
    w0, w1 = wv[:, 0], wv[:, 1]
    s0 = F.sum(E.mul(g0, w0), axis=0)
    s1 = F.sum(E.mul(g1, w1), axis=0)
    g2 = E.add(g1, E.sub(g1, g0))
    w2 = E.add(w1, E.sub(w1, w0))
    s2 = F.sum(E.mul(g2, w2), axis=0)
    return jnp.stack([s0, s1, s2])


@partial(jax.jit, static_argnames=("E", "nv"))
def weighted_eq_table(E, points_m, scales_m, nv: int):
    """Σ_c scales[c] · eq(points[c], ·) as one (2^nv, D) ext table.

    points_m: (C, nv, D) Monty; scales_m: (C, D). The table builds by
    log-depth interleaving over a batched (C, cur, D) tensor — variable
    i = index bit i (mle.py conventions) — then one modular sum over C.
    """
    C = points_m.shape[0]
    one = jnp.zeros((E.D,), jnp.uint32).at[0].set(
        jnp.uint32(E.base.to_monty_h(1))
    )
    table = jnp.broadcast_to(scales_m[:, None, :], (C, 1, E.D))
    for i in range(nv - 1, -1, -1):
        r = points_m[:, i, :][:, None, :]  # (C, 1, D)
        one_minus = E.sub(jnp.broadcast_to(one, r.shape), r)
        lo = E.mul(table, one_minus)
        hi = E.mul(table, r)
        table = jnp.stack([lo, hi], axis=2).reshape(C, -1, E.D)
    return E.base.sum(table, axis=0)  # (2^nv, D)


@partial(jax.jit, static_argnames=("E",))
def coeffs_to_evals_device(E, coeffs):
    """Multilinear coefficients -> hypercube evals ((N, D) ext, in-place
    prefix transform; inverse of the Möbius transform)."""
    c = coeffs
    n = c.shape[0]
    i = 0
    while (1 << i) < n:
        step = 1 << i
        v = c.reshape(-1, 2, step, E.D)
        hi = E.add(v[:, 1], v[:, 0])
        c = jnp.stack([v[:, 0], hi], axis=1).reshape(n, E.D)
        i += 1
    return c


@partial(jax.jit, static_argnames=("E",))
def dot_ext(E, a, b):
    """Σ_i a_i·b_i of two (N, D) ext arrays -> (D,)."""
    return E.base.sum(E.mul(a, b), axis=0)


def ext_powers(E, z_m, log_n: int):
    """[1, z, ..., z^{2^log_n - 1}] as (2^log_n, D) Monty device array
    (log-doubling; z_m a (D,) Monty array)."""
    from ..fri.two_adic_pcs import _ext_powers_device

    return _ext_powers_device(E, z_m, log_n)


@partial(jax.jit, static_argnames=("E",))
def horner_fold_pair(E, coeffs, z_m):
    """One Horner-doubling step: c'(x) = c_even(x) + z·c_odd(x) over
    pairs — used to evaluate a univariate at z in log N steps."""
    m = coeffs.shape[0] // 2
    v = coeffs.reshape(m, 2, E.D)
    return E.add(v[:, 0], E.mul(v[:, 1], z_m))


def eval_univariate_device(E, coeffs, z):
    """Univariate evaluation Σ c_i z^i from a device (N, D) coefficient
    array at host ext z: log N folds c'(x²) = c_e + z·c_o with z
    squaring each step (one jitted fold per halving shape). Returns a
    host ext tuple."""
    z_cur = z
    while coeffs.shape[0] > 1:
        z_m = jnp.asarray(E.to_monty_np(z_cur))
        coeffs = horner_fold_pair(E, coeffs, z_m)
        z_cur = E.mul_h(z_cur, z_cur)
    return tuple(
        int(x) for x in E.base.from_monty_np(np.asarray(coeffs[0]))
    )


def pull_ext(E, dev):
    """Device (..., D) Monty -> host tuple(s) of standard ints."""
    a = E.base.from_monty_np(np.asarray(dev))
    if a.ndim == 1:
        return tuple(int(x) for x in a)
    return [tuple(int(x) for x in row) for row in a.reshape(-1, E.D)]
