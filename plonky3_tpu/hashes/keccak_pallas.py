"""Pallas TPU kernel for the keccak-f[1600] Merkle sponge/compressor.

The XLA lowering of the batched keccak (keccak.py:keccak_f1600_arrays)
round-trips the (h, 50)-u32 state through HBM once per round — 24·39
round trips for a width-1312 leaf hash, ~100 GB of traffic for a 2^18
tree. This kernel keeps the whole sponge state in VMEM/registers for all
absorb blocks and all 24 rounds, so the matrix is read from HBM exactly
once (compute-bound: ~20k u32 VPU ops per permutation).

Layout: leaves are distributed over the VPU batch axes. The input matrix
is pre-packed on the XLA side to (nb·34, h): row index = 34·block +
2·lane + (0 = lo, 1 = hi u32 half), exactly the state-prefix order of
the overwrite-mode rate-17 sponge (PaddingFreeSponge<KeccakF, 25, 17, 4>,
symmetric sponge semantics per SURVEY §2.3). The kernel's state is a
(50, S, 128) u32 value in the same row order, so absorbing block b is
one concatenate and the digest is state rows 0..7 ([u64;4] as
lo/hi-interleaved u32 words — the KeccakFieldSponge digest layout).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .keccak import _RC64

RATE = 17  # u64 lanes per absorb block
# Only shapes at least this tall ride the pallas kernel: every distinct
# (nb, h) is a separate Mosaic compile of the ~10k-op unrolled keccak
# body (minutes on this 1-vCPU host), so small trees/levels stay on the
# XLA path where their traffic is negligible anyway.
PALLAS_MIN_ROWS = 1 << 16
OUT_WORDS = 8  # digest: 4 u64 = 8 u32 rows
BLK = 40  # u32 rows per packed block: 34 payload + 6 pad (sublane align:
# dynamic VMEM loads need starts provably a multiple of 8)

# keccak rho rotation offsets by lane index (5x5 row-major), standard
_RHO = [
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14,
]


def _rotl64(lo, hi, r):
    """Rotate-left a u64 given as (lo, hi) u32 planes, static r."""
    r %= 64
    if r == 0:
        return lo, hi
    if r == 32:
        return hi, lo
    if r < 32:
        nlo = (lo << r) | (hi >> (32 - r))
        nhi = (hi << r) | (lo >> (32 - r))
        return nlo, nhi
    r -= 32
    nlo = (hi << r) | (lo >> (32 - r))
    nhi = (lo << r) | (hi >> (32 - r))
    return nlo, nhi


def _round(lo, hi, rc_lo, rc_hi):
    """One keccak round on 25-element python lists of u32 planes."""
    # theta
    clo = [lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20]
           for x in range(5)]
    chi_ = [hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20]
            for x in range(5)]
    for x in range(5):
        rl, rh = _rotl64(clo[(x + 1) % 5], chi_[(x + 1) % 5], 1)
        dlo = clo[(x + 4) % 5] ^ rl
        dhi = chi_[(x + 4) % 5] ^ rh
        for y in range(0, 25, 5):
            lo[y + x] = lo[y + x] ^ dlo
            hi[y + x] = hi[y + x] ^ dhi
    # rho + pi: B[y][2x+3y] = rot(A[y][x])  (standard index shuffle)
    blo = [None] * 25
    bhi = [None] * 25
    for y in range(5):
        for x in range(5):
            src = 5 * y + x
            dst = 5 * ((2 * x + 3 * y) % 5) + y
            blo[dst], bhi[dst] = _rotl64(lo[src], hi[src], _RHO[src])
    # chi
    for y in range(0, 25, 5):
        row_lo = [blo[y + x] for x in range(5)]
        row_hi = [bhi[y + x] for x in range(5)]
        for x in range(5):
            lo[y + x] = row_lo[x] ^ (~row_lo[(x + 1) % 5] & row_lo[(x + 2) % 5])
            hi[y + x] = row_hi[x] ^ (~row_hi[(x + 1) % 5] & row_hi[(x + 2) % 5])
    # iota
    lo[0] = lo[0] ^ rc_lo
    hi[0] = hi[0] ^ rc_hi
    return lo, hi


def _keccakf(st):
    """24 unrolled rounds; st: (50, S, L) u32 (2·lane + lohi rows).

    Rounds are unrolled with literal round constants (Mosaic has no
    dynamic_slice on values, so an rc table lookup can't lower; the
    ~10k-op straight-line body is the register-resident form we want
    anyway)."""
    lo = [st[2 * i] for i in range(25)]
    hi = [st[2 * i + 1] for i in range(25)]
    for rc in _RC64:
        lo, hi = _round(
            lo, hi, np.uint32(rc & 0xFFFFFFFF), np.uint32(rc >> 32)
        )
    inter = [None] * 50
    for i in range(25):
        inter[2 * i] = lo[i]
        inter[2 * i + 1] = hi[i]
    return jnp.stack(inter, axis=0)


def _sponge_kernel(nb, rem, in_ref, out_ref):
    """Absorb nb rate-blocks (overwrite mode), emit digest rows 0..7.

    The final block overwrites only `rem` lanes (0 = full block) — a
    partial-block absorb keeps the remaining state lanes, matching
    _sponge_arrays in keccak_sponge.py.

    in_ref: (nb*BLK, R) u32; out_ref: (8, R) u32.
    """
    R = in_ref.shape[1]
    S = R // 128
    nfull = nb - 1 if rem else nb

    def absorb(b, st):
        blk = in_ref[pl.ds(b * BLK, 34), :].reshape(34, S, 128)
        st = jnp.concatenate([blk, st[34:]], axis=0)
        return _keccakf(st)

    st0 = jnp.zeros((50, S, 128), jnp.uint32)
    st = jax.lax.fori_loop(0, nfull, absorb, st0)
    if rem:
        k = 2 * rem
        blk = in_ref[(nb - 1) * BLK : (nb - 1) * BLK + k, :].reshape(
            k, S, 128
        )
        st = jnp.concatenate([blk, st[k:]], axis=0)
        st = _keccakf(st)
    out_ref[:] = st[:OUT_WORDS].reshape(OUT_WORDS, R)


_RCS_NP = np.array(
    [[rc & 0xFFFFFFFF, rc >> 32] for rc in _RC64], dtype=np.uint32
)


def _pick_rblk(nb: int, h: int) -> int:
    """Largest batch block with the input slab under ~6 MB of VMEM."""
    for rblk in (4096, 2048, 1024):
        if rblk <= h and nb * BLK * rblk * 4 <= 8 * (1 << 20):
            return rblk
    return 1024


@partial(jax.jit, static_argnames=("nb", "rem"))
def _sponge_call(nb, rem, packed):
    """packed: (nb*34, h) u32 -> (8, h) u32 digests."""
    h = packed.shape[1]
    rblk = _pick_rblk(nb, h)
    grid = (h // rblk,)
    return pl.pallas_call(
        partial(_sponge_kernel, nb, rem),
        out_shape=jax.ShapeDtypeStruct((OUT_WORDS, h), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (nb * BLK, rblk), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (OUT_WORDS, rblk), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=jax.default_backend() == "cpu",
    )(packed)


def _pack_rows(flat):
    """(h, w) u32 -> (nb*BLK, h): rows ordered BLK·block + 2·lane +
    lohi, each rate block padded from 34 to BLK rows."""
    h, w = flat.shape
    if w % 2:
        flat = jnp.concatenate(
            [flat, jnp.zeros((h, 1), jnp.uint32)], axis=1
        )
        w += 1
    nl = w // 2
    nb = -(-nl // RATE)
    pad = nb * RATE - nl
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((h, 2 * pad), jnp.uint32)], axis=1
        )
    # column 2j = lo of lane j, 2j+1 = hi — the kernel row order
    blocks = flat.reshape(h, nb, 34)
    blocks = jnp.concatenate(
        [blocks, jnp.zeros((h, nb, BLK - 34), jnp.uint32)], axis=2
    )
    packed = blocks.transpose(1, 2, 0).reshape(nb * BLK, h)
    rem = nl - (nb - 1) * RATE
    return packed, nb, rem % RATE


def keccak_sponge_rows_pallas(flat):
    """(h, w) u32 device matrix -> (h, 8) u32 digests, or None when the
    shape can't ride the kernel (batch not a multiple of 1024)."""
    h = flat.shape[0]
    if h % 1024 != 0:
        return None
    packed, nb, rem = _pack_rows(flat)
    out = _sponge_call(nb, rem, packed)
    return out.T


def keccak_compress_pallas(left, right):
    """(h, 8) + (h, 8) u32 digest pairs -> (h, 8), or None."""
    h = left.shape[0]
    if h % 1024 != 0:
        return None
    cat = jnp.concatenate([left, right], axis=1)  # (h, 16) word rows
    # word order in digests is already 2·lane + lohi; pad to one block
    packed = jnp.concatenate(
        [cat.T, jnp.zeros((BLK - 16, h), jnp.uint32)], axis=0
    )
    out = _sponge_call(1, 8, packed)
    return out.T
