"""Radix-2 NTT / coset LDE over Goldilocks, on (lo, hi) u32 limb pairs.

Same TPU-first design as ops/ntt.py (the Monty-31 engine; see its header
for the DIF/bitrev layout rationale and the reference citations —
`dft/src/radix_2_dit_parallel.rs`, `goldilocks/src/goldilocks.rs:243`
TWO_ADICITY=32 twiddle chains): natural-order input, bit-reversed
output, stages fused three-at-a-time into radix-8 bodies, coset LDE =
inverse DIF -> scale-by-shift-powers (n^-1 folded in) -> zero-pad ->
forward DIF. All butterflies run on limb-pair arrays so the hot loop
never pays stride-2 lane shuffles; the wire form (interleaved limbs)
exists only at the Merkle/proof boundary (gl/field.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import goldilocks_device as gd
from ..fields.goldilocks import Goldilocks
from ..utils.bits import bitrev_permute_axis0, log2_strict
from .field import powers_host, powers_pair_device

_P = Goldilocks.P

_TWIDDLE_CACHE: dict = {}


def _twiddles(log_n: int, inverse: bool):
    key = (log_n, inverse)
    tw = _TWIDDLE_CACHE.get(key)
    if tw is None:
        g = Goldilocks.two_adic_generator_h(log_n)
        if inverse:
            g = Goldilocks.inv_h(g)
        p = powers_host(g, max(1 << (log_n - 1), 1))
        tw = (
            (p & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (p >> np.uint64(32)).astype(np.uint32),
        )
        _TWIDDLE_CACHE[key] = tw
    return jnp.asarray(tw[0]), jnp.asarray(tw[1])


def _pair_bitrev(pair, log_n: int):
    return (
        bitrev_permute_axis0(pair[0], log_n),
        bitrev_permute_axis0(pair[1], log_n),
    )


def gl_dif(pair, log_n: int, inverse: bool):
    """DIF butterfly network along axis 0 of a (n, ...) limb-pair.
    Natural in, bit-reversed out; stages fused 3-at-a-time (radix-8
    bodies, bit-identical to three radix-2 stages)."""
    n = 1 << log_n
    if log_n == 0:
        return pair
    twl, twh = _twiddles(log_n, inverse)
    lo, hi = pair
    rest = lo.shape[1:]
    bcast = (1,) * len(rest)
    lo = lo.reshape((1, n) + rest)
    hi = hi.reshape((1, n) + rest)
    s = 0
    while s < log_n:
        k = min(3, log_n - s)
        m = n >> s
        q = m >> k
        parts = [
            (lo[:, i * q : (i + 1) * q], hi[:, i * q : (i + 1) * q])
            for i in range(1 << k)
        ]

        def rec(parts, d, s=s, q=q):
            if len(parts) == 1:
                return parts
            half = len(parts) // 2
            step = 1 << (s + d)
            tl, th = twl[::step], twh[::step]
            tops, bots = [], []
            for j in range(half):
                t, u = parts[j], parts[j + half]
                tw = (
                    tl[j * q : (j + 1) * q].reshape((1, q) + bcast),
                    th[j * q : (j + 1) * q].reshape((1, q) + bcast),
                )
                tops.append(gd.add(t, u))
                bots.append(gd.mul(gd.sub(t, u), tw))
            return rec(tops, d + 1) + rec(bots, d + 1)

        out = rec(parts, 0)
        lo = jnp.concatenate([p[0] for p in out], axis=1).reshape(
            ((1 << (s + k)), q) + rest
        )
        hi = jnp.concatenate([p[1] for p in out], axis=1).reshape(
            ((1 << (s + k)), q) + rest
        )
        s += k
    return lo.reshape((n,) + rest), hi.reshape((n,) + rest)


@jax.jit
def gl_dft(pair):
    """Forward DFT, natural order in and out."""
    log_n = log2_strict(pair[0].shape[0])
    return _pair_bitrev(gl_dif(pair, log_n, inverse=False), log_n)


@jax.jit
def gl_idft(pair):
    """Inverse DFT, natural order in and out."""
    log_n = log2_strict(pair[0].shape[0])
    out = _pair_bitrev(gl_dif(pair, log_n, inverse=True), log_n)
    inv_n = gd.const(Goldilocks.inv_h(1 << log_n))
    return gd.mul(out, inv_n)


@partial(jax.jit, static_argnames=("added_bits", "shift_std", "with_coeffs"))
def gl_coset_lde_batch(pair, added_bits: int, shift_std: int,
                       with_coeffs: bool = False):
    """LDE onto the coset shift·K, |K| = n·2^added_bits; output rows in
    bit-reversed order (the FRI-commit layout). With with_coeffs=True
    also returns the scaled coefficients a_i = c_i·shift^i (opening at ζ
    is then one weighted dot — see gl/pcs.py)."""
    lo, hi = pair
    log_n = log2_strict(lo.shape[0])
    log_N = log_n + added_bits
    n, N = 1 << log_n, 1 << log_N

    coeffs = _pair_bitrev(gl_dif(pair, log_n, inverse=True), log_n)
    sp = powers_pair_device(
        shift_std, n, scale=Goldilocks.inv_h(n)
    )
    shp = (n,) + (1,) * (lo.ndim - 1)
    coeffs = gd.mul(coeffs, (sp[0].reshape(shp), sp[1].reshape(shp)))
    pad_shape = (N - n,) + lo.shape[1:]
    padded = (
        jnp.concatenate([coeffs[0], jnp.zeros(pad_shape, jnp.uint32)], 0),
        jnp.concatenate([coeffs[1], jnp.zeros(pad_shape, jnp.uint32)], 0),
    )
    out = gl_dif(padded, log_N, inverse=False)
    if with_coeffs:
        return out, coeffs
    return out
