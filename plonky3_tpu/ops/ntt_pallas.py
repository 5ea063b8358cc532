"""Fused four-step DIF NTT on pallas.

The stage-by-stage XLA network round-trips the whole array through HBM
once per radix-8 body (~12 passes at 2^18); this four-step split does
the same arithmetic in TWO pallas kernels that each keep their
sub-transform entirely in VMEM:

    x[(a, b), w],  n = A·B
    1. K1: DIF_A over the a-axis per (b, w-block); the b-dependent
       correction  w_n^{rev_A(a_out)·b}  multiplies on the XLA side
       (verified bit-identical to the first log A stages of the full
       network)
    2. K2: DIF_B over the b-axis per (a, w-block) — the remaining stages
       of the full network ARE a pure DIF_B per block.

Butterfly layout (the perf-critical choice): blocks are rank-3
(rows, sublanes, lanes) and Mosaic tiles only the LAST TWO dims, so any
static slice/concat along axis 0 is layout-free. K1 therefore runs its
whole DIF as reshape→slice→butterfly→concat along the untiled axis —
one add, one sub, one twiddle mul per butterfly PAIR. K2 transforms the
sublane axis: stages with half ≥ 8 sublanes use the same slice/concat
form (8-aligned slices are layout-free); the final three stages
(half = 4, 2, 1) swap the within-8 dim to the untiled axis once
(micro-transpose), run as layout-free slice butterflies, and swap back.

Twiddle multiplies use Shoup's precomputed-quotient form
(`Monty31.mul_shoup`): twiddles are constants, so each stage table holds
the standard-form twiddle AND floor(w·2^32/P); the butterfly mul is then
q = hi32(a·w_sh); r = a·w − q·P with one conditional subtract — ~16 VPU
ops vs ~26 for the generic Monty mul, with a bit-identical canonical
result (the kernels are pinned against ops/ntt._dif by the fixture
suite).

Output is bit-for-bit the same bit-reversed DIF order as ops/ntt._dif.
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
_ABLK = 8  # a-rows per K2 block
_BBLK = 8  # b-columns per K1 block

# Butterfly bodies keep several block-sized temporaries live at once;
# the default 16M scoped-vmem cap trips at A=512. Total VMEM is 128M —
# allow Mosaic to use most of it.
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _dif_slices_axis0(F, x, log_m, tw_ref, zero_top=False):
    """DIF_M over axis 0 of a rank-3 (M, S, L) value via layout-free
    slice/concat butterflies (axis 0 is untiled).

    tw_ref is the (2·log_m·M,) packed Shoup table: the first log_m·M
    entries are standard-form per-stage twiddles (stage s at offset s·M
    holds tw_sub[i·2^s] for i < half), the second half their Shoup
    precomputations at the same offsets.

    zero_top: x is the (M/2, S, L) nonzero half of a [x; 0] input (the
    coset-LDE zero-pad); stage 0 degenerates to out = [x, x·tw] so the
    zero half is never materialized or read."""
    M = 1 << log_m
    L0 = log_m * M
    start = 0
    if zero_top:
        half = M >> 1
        tw = tw_ref[0:half].reshape(half, 1, 1)
        sh = tw_ref[L0 : L0 + half].reshape(half, 1, 1)
        x = jnp.concatenate([x, F.mul_shoup(x, tw, sh)], axis=0)
        start = 1
    _, S, L = x.shape
    for s in range(start, log_m):
        groups = 1 << s
        m = M >> s
        half = m >> 1
        x4 = x.reshape(groups, m, S, L)
        t = x4[:, :half]
        u = x4[:, half:]
        tw = tw_ref[s * M : s * M + half].reshape(1, half, 1, 1)
        sh = tw_ref[L0 + s * M : L0 + s * M + half].reshape(1, half, 1, 1)
        x = jnp.concatenate(
            [F.add(t, u), F.mul_shoup(F.sub(t, u), tw, sh)], axis=1
        ).reshape(M, S, L)
    return x


def _dif_sublane(F, x, log_m, tw_ref, tail_ref):
    """DIF_M over axis 1 (the sublane axis) of a rank-3 (S, M, L) value.

    Stages with half ≥ 8 use 8-aligned slice/concat butterflies. The
    final three stages (half < 8) pair rows WITHIN each 8-sublane tile;
    rather than paying sublane rolls (which Mosaic lowers as full-block
    shuffles, ~10 ms/stage at this shape), the within-8 dim is swapped
    to the untiled axis once (micro-transpose), the three stages run as
    layout-free slice butterflies there, and one swap brings it back.
    tail_ref materializes the tail twiddles as (8, 128) tiles because a
    scalar broadcast over both sublanes AND lanes is not a single Mosaic
    op (tail rows t·8+i hold tw_sub[i << (log_m-3+t)]; rows 24+ hold the
    Shoup precomputations)."""
    S, M, L = x.shape
    L0 = log_m * M
    n_tail = min(3, log_m)
    for s in range(log_m - n_tail):
        groups = 1 << s
        m = M >> s
        half = m >> 1
        x4 = x.reshape(S, groups, m, L)
        t = x4[:, :, :half]
        u = x4[:, :, half:]
        tw = tw_ref[0, s * M : s * M + half].reshape(1, 1, half, 1)
        sh = tw_ref[0, L0 + s * M : L0 + s * M + half].reshape(
            1, 1, half, 1
        )
        x = jnp.concatenate(
            [F.add(t, u), F.mul_shoup(F.sub(t, u), tw, sh)], axis=2
        ).reshape(S, M, L)
    if n_tail == 0:
        return x
    T = 1 << n_tail
    G = M // T
    y = jnp.swapaxes(x.reshape(S, G, T, L), 0, 2)  # (T, G, S, L)
    for t in range(n_tail):
        mm = T >> t
        half = mm >> 1
        g2 = T // mm
        y5 = y.reshape(g2, mm, G, S, L)
        tt = y5[:, :half]
        u = y5[:, half:]
        tw = tail_ref[t * 8 : t * 8 + half].reshape(1, half, 1, 8, 128)
        sh = tail_ref[24 + t * 8 : 24 + t * 8 + half].reshape(
            1, half, 1, 8, 128
        )
        y = jnp.concatenate(
            [F.add(tt, u), F.mul_shoup(F.sub(tt, u), tw, sh)], axis=1
        ).reshape(T, G, S, L)
    return jnp.swapaxes(y, 0, 2).reshape(S, M, L)


def _k1_kernel(F, log_a, zero_top, x_ref, tw_ref, corr_ref, o_ref):
    """(A, 8, 128) block: DIF_A over axis 0, then the four-step
    correction factor (fused — corr block is (2A, 8, 1): std rows then
    Shoup rows)."""
    A = 1 << log_a
    y = _dif_slices_axis0(F, x_ref[...], log_a, tw_ref, zero_top)
    o_ref[...] = F.mul_shoup(y, corr_ref[0:A], corr_ref[A : 2 * A])


def _k2_kernel(F, log_b, x_ref, tw_ref, tail_ref, o_ref):
    """(8, B, 128) block: DIF_B over axis 1 (sublanes)."""
    o_ref[...] = _dif_sublane(F, x_ref[...], log_b, tw_ref, tail_ref)


@partial(jax.jit, static_argnames=("F", "log_n", "inverse", "zero_top"))
def dif_fused(F, x, log_n: int, inverse: bool, zero_top: bool = False):
    """Drop-in for ops/ntt._dif on 2-D (n, w) arrays, n = 2^log_n.

    zero_top: x holds only the first n/2 rows; the upper half is an
    implicit zero pad (coset-LDE forward transform) that is synthesized
    in-kernel instead of being materialized in HBM."""
    from .ntt import powers_std_np

    n = 1 << log_n
    w = x.shape[1]
    assert x.shape[0] == (n >> 1 if zero_top else n)
    log_a = min(log_n - (log_n // 2), _MAX_LOG_HALF)
    log_b = log_n - log_a
    A, B = 1 << log_a, 1 << log_b

    # Width needs no padding: the grid ceil-divides w and Pallas handles
    # the partial edge blocks (OOB loads padded, OOB stores masked);
    # columns are independent so edge-block padding lanes never leak.
    wg = pl.cdiv(w, _WBLK)

    g = F.two_adic_generator_h(log_n)
    if inverse:
        g = F.inv_h(g)
    tw_full = np.asarray(powers_std_np(F, g, max(1 << (log_n - 1), 1)))
    tw_a = _stage_twiddles(F, tw_full[::B][: A // 2], log_a,
                           (log_n, inverse, "a"))
    tw_b = _stage_twiddles(F, tw_full[::A][: B // 2], log_b,
                           (log_n, inverse, "b"))
    tail_b = _tail_tiles(F, tw_full[::A][: B // 2], log_b,
                         (log_n, inverse, "b"))
    corr = _corr_table(F, log_n, log_a, inverse)  # (2A, B)

    a_in = A >> 1 if zero_top else A
    x3 = x.reshape(a_in, B, w)
    y1 = pl.pallas_call(
        partial(_k1_kernel, F, log_a, zero_top),
        out_shape=jax.ShapeDtypeStruct((A, B, w), jnp.uint32),
        grid=(B // _BBLK, wg),
        in_specs=[
            pl.BlockSpec((a_in, _BBLK, _WBLK), lambda gb, wb: (0, gb, wb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * log_a * A, 1, 1), lambda gb, wb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * A, _BBLK, 1), lambda gb, wb: (0, gb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (A, _BBLK, _WBLK), lambda gb, wb: (0, gb, wb),
            memory_space=pltpu.VMEM,
        ),
        interpret=jax.default_backend() == "cpu",
        compiler_params=_PARAMS,
    )(x3, tw_a.reshape(-1, 1, 1), corr.reshape(2 * A, B, 1))

    y2 = pl.pallas_call(
        partial(_k2_kernel, F, log_b),
        out_shape=jax.ShapeDtypeStruct((A, B, w), jnp.uint32),
        grid=(A // _ABLK, wg),
        in_specs=[
            pl.BlockSpec((_ABLK, B, _WBLK), lambda a, wb: (a, 0, wb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * log_b * B, 1), lambda a, wb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((48, 8, 128), lambda a, wb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_ABLK, B, _WBLK), lambda a, wb: (a, 0, wb),
            memory_space=pltpu.VMEM,
        ),
        interpret=jax.default_backend() == "cpu",
        compiler_params=_PARAMS,
    )(y1, tw_b.reshape(1, -1, 1), tail_b)
    return y2.reshape(n, w)


_TW_CACHE: dict = {}


def _stage_twiddles(F, tw_sub, log_m, key_extra):
    """Packed (2·log_m·M,) per-stage Shoup twiddle tables for the slice
    butterflies: offset s·M holds standard-form tw_sub[i·2^s] for
    i < M >> (s+1); offset log_m·M + s·M the Shoup precomputations."""
    key = ("slices", F.name, log_m) + tuple(key_extra)
    hit = _TW_CACHE.get(key)
    if hit is not None:
        # cache holds NUMPY arrays (a jnp constant created inside one
        # jit trace is a tracer — caching it leaks across traces)
        return jnp.asarray(hit)
    M = 1 << log_m
    tws = np.zeros((2 * log_m * M,), np.uint32)
    for s in range(log_m):
        half = M >> (s + 1)
        stage = tw_sub[:: 1 << s][:half]
        tws[s * M : s * M + half] = stage
        tws[log_m * M + s * M : log_m * M + s * M + half] = F.shoup_np(stage)
    _TW_CACHE[key] = tws
    return jnp.asarray(tws)


def _tail_tiles(F, tw_sub, log_m, key_extra):
    """(48, 8, 128) twiddle tiles for the micro-transposed tail stages:
    tail stage t (group size 8 >> t) reads rows t·8+i = tw_sub[i <<
    (log_m-3+t)] replicated over an (8, 128) tile (see _dif_sublane);
    rows 24+ hold the Shoup precomputations."""
    key = ("tail", F.name, log_m) + tuple(key_extra)
    hit = _TW_CACHE.get(key)
    if hit is not None:
        return jnp.asarray(hit)
    n_tail = min(3, log_m)
    tiles = np.zeros((48, 8, 128), np.uint32)
    for t in range(n_tail):
        s = log_m - n_tail + t
        half = (8 >> t) >> 1
        for i in range(half):
            tiles[t * 8 + i] = tw_sub[i << s]
            tiles[24 + t * 8 + i] = F.shoup_np(
                np.asarray(tw_sub[i << s], np.uint32)
            )
    _TW_CACHE[key] = tiles
    return jnp.asarray(tiles)


_CORR_CACHE: dict = {}


def _corr_table(F, log_n, log_a, inverse):
    """(2A, B) table: rows [0, A) the standard-form correction
    corr[a, b] = w_n^{±rev_A(a)·b}, rows [A, 2A) its Shoup
    precomputation (host, cached)."""
    from .ntt import powers_std_np

    key = (F.name, log_n, log_a, inverse)
    t = _CORR_CACHE.get(key)
    if t is None:
        A = 1 << log_a
        B = 1 << (log_n - log_a)
        w_n = F.two_adic_generator_h(log_n)
        if inverse:
            w_n = F.inv_h(w_n)
        t = np.zeros((2 * A, B), np.uint32)
        for a in range(A):
            k = reverse_bits_len(a, log_a)
            row = np.asarray(powers_std_np(F, F.exp_h(w_n, k), B))
            t[a] = row
            t[A + a] = F.shoup_np(row)
        _CORR_CACHE[key] = t
    return jnp.asarray(t)
