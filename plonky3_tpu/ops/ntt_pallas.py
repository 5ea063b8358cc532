"""Fused four-step DIF NTT on pallas.

The stage-by-stage XLA network round-trips the whole array through HBM
once per radix-8 body (~12 passes at 2^18); this four-step split does
the same arithmetic in TWO pallas kernels that each keep their
sub-transform entirely in VMEM, plus two XLA transposes:

    x[(a, b), w],  n = A·B
    1. transpose -> (b, a, w)
    2. K1: DIF_A over the a-axis per (b, w-block); the b-dependent
       correction  w_n^{rev_A(a_out)·b}  multiplies on the XLA side
       (verified bit-identical to the first log A stages of the full
       network)
    3. transpose back -> (a, b, w)
    4. K2: DIF_B over the b-axis per (a, w-block) — the remaining stages
       of the full network ARE a pure DIF_B per block.

In-kernel butterflies avoid reshapes/concats entirely (they forced a
tile relayout per stage, 10x over roofline): stage s pairs rows i and
i±half via two sublane `pltpu.roll`s and a per-row select,

    out = mask·(x + roll(x, -half)) + (1-mask)·(roll(x, +half) - x)·tw

with the per-stage mask/twiddle columns packed contiguously so every
in-kernel slice is static.

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


def _dif_block_rolls(F, x, log_m, axis, mask_ref, tw_ref):
    """DIF_M over `axis` of a rank-3 value via per-stage rolls.

    mask_ref/tw_ref hold per-stage columns packed along `axis` (length
    log_m·M there, broadcast shape elsewhere): mask = 1 on the top row
    of each butterfly pair; tw = 1 on top rows, the stage twiddle on
    bottom rows."""
    M = x.shape[axis]

    def tab(ref, s):
        if axis == 0:
            return ref[s * M : (s + 1) * M]
        return ref[:, s * M : (s + 1) * M, :]

    for s in range(log_m):
        half = (M >> s) >> 1
        mask = tab(mask_ref, s)
        tw = tab(tw_ref, s)
        down = pltpu.roll(x, shift=(M - half) % M, axis=axis)  # i+half
        up = pltpu.roll(x, shift=half, axis=axis)  # i-half
        top = F.add(x, down)
        bot = F.mul(F.sub(up, x), tw)
        x = jnp.where(mask != 0, top, bot)
    return x


def _k1_kernel(F, log_a, x_ref, mask_ref, tw_ref, corr_ref, o_ref):
    """(A, 8, 128) block: DIF_A over axis 0, then the four-step
    correction factor (fused — corr block is (A, 8, 1))."""
    y = _dif_block_rolls(F, x_ref[...], log_a, 0, mask_ref, tw_ref)
    o_ref[...] = F.mul(y, corr_ref[...])


def _k2_kernel(F, log_b, x_ref, mask_ref, tw_ref, o_ref):
    """(1, B, 128) block: DIF_B over axis 1."""
    o_ref[...] = _dif_block_rolls(
        F, x_ref[...], log_b, 1, mask_ref, tw_ref
    )


_BBLK = 8  # b-columns per K1 block

# The unrolled roll-stage bodies keep several block-sized temporaries
# live at once; the default 16M scoped-vmem cap trips at A=512. Total
# VMEM is 128M — allow Mosaic to use half of it for the stack.
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@partial(jax.jit, static_argnames=("F", "log_n", "inverse"))
def dif_fused(F, x, log_n: int, inverse: bool):
    """Drop-in for ops/ntt._dif on 2-D (n, w) arrays, n = 2^log_n."""
    from .ntt import powers_np

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

    g = F.two_adic_generator_h(log_n)
    if inverse:
        g = F.inv_h(g)
    tw_full = np.asarray(powers_np(F, g, max(1 << (log_n - 1), 1)))
    mask_a, tw_a = _stage_tables(F, tw_full[::B][: A // 2], log_a,
                                 (log_n, inverse, "a"))
    mask_b, tw_b = _stage_tables(F, tw_full[::A][: B // 2], log_b,
                                 (log_n, inverse, "b"))
    corr = _corr_table(F, log_n, log_a, inverse)  # (A, B)

    x3 = x.reshape(A, B, w_pad)
    y1 = pl.pallas_call(
        partial(_k1_kernel, F, log_a),
        out_shape=jax.ShapeDtypeStruct((A, B, w_pad), jnp.uint32),
        grid=(B // _BBLK, w_pad // _WBLK),
        in_specs=[
            pl.BlockSpec((A, _BBLK, _WBLK), lambda gb, wb: (0, gb, wb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((log_a * A, 1, 1), lambda gb, wb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((log_a * A, 1, 1), lambda gb, wb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A, _BBLK, 1), lambda gb, wb: (0, gb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (A, _BBLK, _WBLK), lambda gb, wb: (0, gb, wb),
            memory_space=pltpu.VMEM,
        ),
        interpret=jax.default_backend() == "cpu",
        compiler_params=_PARAMS,
    )(x3, mask_a.reshape(-1, 1, 1), tw_a.reshape(-1, 1, 1),
      corr.reshape(A, B, 1))

    y2 = pl.pallas_call(
        partial(_k2_kernel, F, log_b),
        out_shape=jax.ShapeDtypeStruct((A, B, w_pad), jnp.uint32),
        grid=(A, w_pad // _WBLK),
        in_specs=[
            pl.BlockSpec((1, B, _WBLK), lambda a, wb: (a, 0, wb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, log_b * B, 1), lambda a, wb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, log_b * B, 1), lambda a, wb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, B, _WBLK), lambda a, wb: (a, 0, wb),
            memory_space=pltpu.VMEM,
        ),
        interpret=jax.default_backend() == "cpu",
        compiler_params=_PARAMS,
    )(y1, mask_b.reshape(1, -1, 1), tw_b.reshape(1, -1, 1))
    return y2.reshape(n, w_pad)[:, :w]


_TABLE_CACHE: dict = {}


def _stage_tables(F, tw_sub, log_m, key_extra):
    """Packed (log_m·M, 1) mask + twiddle columns for the roll kernels.

    Viewing the block's M rows through stage s (group size m = M >> s):
    row i is a TOP row when (i mod m) < m/2 — out = x[i] + x[i+half];
    otherwise out = (x[i-half] - x[i]) · tw_sub[((i mod m) - half) << s]."""
    key = (F.name, log_m) + tuple(key_extra)
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        # cache holds NUMPY arrays (a jnp constant created inside one
        # jit trace is a tracer — caching it leaks across traces)
        return jnp.asarray(hit[0]), jnp.asarray(hit[1])
    M = 1 << log_m
    one_m = np.uint32(F.to_monty_h(1))
    masks = np.zeros((log_m * M, 1), np.uint32)
    tws = np.zeros((log_m * M, 1), np.uint32)
    for s in range(log_m):
        m = M >> s
        half = m >> 1
        for i in range(M):
            pos = i % m
            if pos < half:
                masks[s * M + i, 0] = 1
                tws[s * M + i, 0] = one_m
            else:
                tws[s * M + i, 0] = tw_sub[(pos - half) << s]
    _TABLE_CACHE[key] = (masks, tws)
    return jnp.asarray(masks), jnp.asarray(tws)


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
