"""Multi-chip NTT / coset LDE over a device mesh.

The TPU realization of `Radix2DitParallel`'s two-half decomposition
(dft/src/radix_2_dit_parallel.rs:22-28, SURVEY.md §2.7.3): viewing the
length-n axis as (A, B), the first log A DIF stages only pair rows within
a column of that view, the remaining log B stages only within a row. Shard
columns (B) for phase 1, re-shard to rows (A) for phase 2 — the re-shard
is ONE all-to-all over ICI, inserted by XLA from sharding constraints
(the GSPMD recipe: annotate, let the compiler place collectives).

Everything else (twiddle multiply, zero-pad, scale) is elementwise and
stays in whatever sharding it arrives in.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..fields.monty31 import Monty31
from ..ops.ntt import _dif, _shift_powers, _twiddles
from ..utils.bits import bitrev_permute_axis0, log2_strict


def _dif_sharded(F, x, log_n, inverse, mesh, axis):
    """DIF butterfly network with a phase boundary: stages 0..log_A-1 run
    column-sharded, the rest row-sharded (one all-to-all between)."""
    n = 1 << log_n
    ndev = mesh.shape[axis]
    log_dev = log2_strict(ndev)
    # A must cover the cross-device stages; B must cover at least ndev
    log_a = max(log_dev, log_n // 2)
    log_a = min(log_a, log_n - log_dev)
    if log_a <= 0:
        # too small to shard usefully; run replicated
        return _dif(F, x, log_n, inverse)
    A, B = 1 << log_a, 1 << (log_n - log_a)
    rest = x.shape[1:]
    tw_full = _twiddles(F, log_n, inverse)

    def constrain(v, spec):
        return jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, spec)
        )

    # phase 1: stages 0..log_a-1, (A, B) view sharded along B
    col_spec = P(None, axis) + (None,) * len(rest)
    x = constrain(x.reshape((A, B) + rest), col_spec)
    x = x.reshape((1, n) + rest)
    for s in range(log_a):
        m = n >> s
        half = m >> 1
        tw = tw_full[:: 1 << s].reshape((1, half) + (1,) * len(rest))
        t, u = x[:, :half], x[:, half:]
        top = F.add(t, u)
        bot = F.mul(F.sub(t, u), tw)
        x = jnp.concatenate([top, bot], axis=1).reshape(
            (2 << s, half) + rest
        )
        x = constrain(
            x.reshape((A, B) + rest), col_spec
        ).reshape((2 << s, half) + rest)

    # the all-to-all: re-shard the (A, B) view along A
    row_spec = P(axis) + (None,) * (1 + len(rest))
    x = constrain(x.reshape((A, B) + rest), row_spec)

    # phase 2: remaining stages are local within each A-row
    x = x.reshape((1 << log_a, B) + rest)
    for s in range(log_a, log_n):
        m = n >> s
        half = m >> 1
        tw = tw_full[:: 1 << s].reshape((1, half) + (1,) * len(rest))
        t, u = x[:, :half], x[:, half:]
        top = F.add(t, u)
        bot = F.mul(F.sub(t, u), tw)
        x = jnp.concatenate([top, bot], axis=1).reshape(
            (2 << s, half) + rest
        )
        x = constrain(
            x.reshape((A, B) + rest), row_spec
        ).reshape((2 << s, half) + rest)
    return x.reshape((n,) + rest)


@partial(
    jax.jit,
    static_argnames=("F", "added_bits", "shift_std", "mesh", "axis"),
)
def coset_lde_batch_sharded(
    F: Monty31, mat, added_bits: int, shift_std: int, mesh, axis="sp"
):
    """Row-sharded coset LDE: natural-order (n, w) in, bit-reversed
    (n·2^added_bits, w) out, rows sharded over `axis` at entry and exit.

    Same semantics as ops.ntt.coset_lde_batch (two_adic_pcs.rs:300).
    """
    log_n = log2_strict(mat.shape[0])
    log_N = log_n + added_bits
    n, N = 1 << log_n, 1 << log_N

    coeffs_br = _dif_sharded(F, mat, log_n, True, mesh, axis)
    coeffs = bitrev_permute_axis0(coeffs_br, log_n)
    sp = _shift_powers(F, log_n, shift_std, F.inv_h(n))
    coeffs = F.mul(coeffs, sp.reshape((n,) + (1,) * (mat.ndim - 1)))
    pad = jnp.zeros((N - n,) + mat.shape[1:], jnp.uint32)
    coeffs = jnp.concatenate([coeffs, pad], axis=0)
    out = _dif_sharded(F, coeffs, log_N, False, mesh, axis)
    return jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P(axis) + (None,) * (mat.ndim - 1))
    )
