"""Fused four-step DIF NTT on pallas.

The stage-by-stage XLA network round-trips the whole array through HBM
once per stage pair (~18 passes at 2^18); this four-step split does the
same arithmetic in TWO pallas kernels that each keep their sub-transform
entirely in VMEM, plus two XLA transposes:

    x[(a, b), w],  n = A·B
    1. transpose -> (b, a, w)
    2. K1: DIF_A over the a-axis per (b, w-block), then multiply the
       correction  w_n^{rev_A(a_out)·b}  (verified bit-identical to the
       first log A stages of the full network)
    3. transpose back -> (a, b, w)
    4. K2: DIF_B over the b-axis per (a, w-block) — the remaining stages
       of the full network ARE a pure DIF_B per block.

Output is bit-for-bit the same bit-reversed DIF order as ops/ntt._dif
(the fixture bit-identity suite pins this).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.bits import reverse_bits_len

_WBLK = 128
_MAX_LOG_HALF = 10  # sub-transform size cap (VMEM)


def _dif_block(F, x, log_m, tw_packed):
    """DIF_M over axis 0 of an (M, wblk) value; tw_packed: stage
    twiddles packed contiguously (static offsets — Mosaic cannot lower
    strided value slices). Same arithmetic as ops/ntt._dif."""
    M = 1 << log_m
    wblk = x.shape[-1]
    off = 0
    for s in range(log_m):
        m = M >> s
        half = m >> 1
        g = M // m
        xr = x.reshape(g, m, wblk)
        t = xr[:, :half]
        u = xr[:, half:]
        tws = tw_packed[off : off + half].reshape(1, half, 1)
        off += half
        top = F.add(t, u)
        bot = F.mul(F.sub(t, u), tws)
        x = jnp.concatenate([top, bot], axis=1).reshape(M, wblk)
    return x


def _pack_stage_twiddles(tw_sub):
    """Concatenate the per-stage tables tw_sub[::2^s] (lengths M/2,
    M/4, ..., 1) into one (M-1, 1) column: host-side slicing, static
    in-kernel offsets."""
    M2 = int(tw_sub.shape[0])  # M/2
    log_m = M2.bit_length()  # log2(M2) + 1 stages
    parts = [tw_sub[:: 1 << s][: M2 >> s] for s in range(log_m)]
    return jnp.concatenate(parts).reshape(-1, 1)


def _k1_kernel(F, log_a, x_ref, tw_ref, o_ref):
    """DIF_A; block (A, wblk). The b-dependent correction factor is
    applied on the XLA side where it fuses with the transpose."""
    o_ref[...] = _dif_block(F, x_ref[...], log_a, tw_ref[...])


def _k2_kernel(F, log_b, x_ref, tw_ref, o_ref):
    """Pure DIF_B; block (B, wblk)."""
    o_ref[...] = _dif_block(F, x_ref[...], log_b, tw_ref[...])


@partial(jax.jit, static_argnames=("F", "log_n", "inverse"))
def dif_fused(F, x, log_n: int, inverse: bool):
    """Drop-in for ops/ntt._dif on 2-D (n, w) arrays, n = 2^log_n."""
    from .ntt import _twiddles, powers_np

    n = 1 << log_n
    w = x.shape[1]
    log_a = min(log_n - (log_n // 2), _MAX_LOG_HALF)
    log_b = log_n - log_a
    A, B = 1 << log_a, 1 << log_b

    w_pad = -(-w // _WBLK) * _WBLK
    if w_pad != w:
        x = jnp.concatenate(
            [x, jnp.zeros((n, w_pad - w), jnp.uint32)], axis=1
        )

    tw_full = _twiddles(F, log_n, inverse)  # (n/2,) monty
    tw_a = _pack_stage_twiddles(tw_full[::B][: A // 2])  # w_A powers
    tw_b = _pack_stage_twiddles(tw_full[::A][: B // 2])  # w_B powers
    # correction table corr_T[a, b] = w_n^{rev_A(a)·b}, stage-group-1
    # residue factors (see module docstring); host-exact, cached by jit
    corr = _corr_table(F, log_n, log_a, inverse)

    x1 = x.reshape(A, B, w_pad).transpose(1, 0, 2).reshape(B * A, w_pad)
    grid1 = (B, w_pad // _WBLK)
    y1 = pl.pallas_call(
        partial(_k1_kernel, F, log_a),
        out_shape=jax.ShapeDtypeStruct((B * A, w_pad), jnp.uint32),
        grid=grid1,
        in_specs=[
            pl.BlockSpec((A, _WBLK), lambda b, wb: (b, wb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A - 1, 1), lambda b, wb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((A, _WBLK), lambda b, wb: (b, wb),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(x1, tw_a)

    y1 = F.mul(
        y1.reshape(B, A, w_pad), corr.T[:, :, None]
    ).reshape(B * A, w_pad)
    x2 = y1.reshape(B, A, w_pad).transpose(1, 0, 2).reshape(A * B, w_pad)
    grid2 = (A, w_pad // _WBLK)
    y2 = pl.pallas_call(
        partial(_k2_kernel, F, log_b),
        out_shape=jax.ShapeDtypeStruct((A * B, w_pad), jnp.uint32),
        grid=grid2,
        in_specs=[
            pl.BlockSpec((B, _WBLK), lambda a, wb: (a, wb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B - 1, 1), lambda a, wb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, _WBLK), lambda a, wb: (a, wb),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(x2, tw_b)
    return y2[:, :w]


_CORR_CACHE: dict = {}


def _corr_table(F, log_n, log_a, inverse):
    """(A, B) monty table corr[a, b] = w_n^{±rev_A(a)·b} (host, cached)."""
    from .ntt import powers_np

    key = (F.name, log_n, log_a, inverse)
    t = _CORR_CACHE.get(key)
    if t is None:
        A = 1 << log_a
        B = 1 << (log_n - log_a)
        w_n = F.two_adic_generator_h(log_n)
        if inverse:
            w_n = F.inv_h(w_n)
        t = np.zeros((A, B), np.uint32)
        for a in range(A):
            k = reverse_bits_len(a, log_a)
            t[a] = np.asarray(powers_np(F, F.exp_h(w_n, k), B))
        _CORR_CACHE[key] = t
    return jnp.asarray(t)