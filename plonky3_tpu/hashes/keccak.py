"""Keccak-f[1600] + Keccak-256, on 32-bit lane pairs.

Re-design of the reference `keccak` crate (`keccak/src/lib.rs:70` KeccakF,
`:100` Keccak256Hash; SIMD multi-lane impls in avx2/avx512/neon) for TPU:
each 64-bit lane is an (lo, hi) pair of uint32s, and the permutation is
batched over thousands of states — the batch axis replaces the reference's
2/4/8-wide SIMD vectorization. One implementation serves jnp (device) and
numpy (host tails) via the `xp` module parameter; python-int helpers cover
the byte-level Keccak-256 used by transcripts.

Rotation across the 32-bit split: rotl64((lo,hi), r) swaps words when
r >= 32 and then shifts with cross-carry — all static shifts, no gathers.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# round constants (standard Keccak LFSR output), split into (lo, hi) u32
_RC64 = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rho rotation offsets, flat index x + 5*y
_RHO = [
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14,
]

_M32 = 0xFFFFFFFF


def _rotl(xp, lo, hi, r):
    r %= 64
    if r == 0:
        return lo, hi
    if r >= 32:
        lo, hi = hi, lo
        r -= 32
    if r == 0:
        return lo, hi
    u32 = np.uint32(r)
    c32 = np.uint32(32 - r)
    nlo = (lo << u32) | (hi >> c32)
    nhi = (hi << u32) | (lo >> c32)
    return nlo, nhi


def _keccak_round(xp, lo, hi, rc_lo, rc_hi):
    """One Keccak round on (..., 25) lo/hi uint32 arrays."""
    L = [(lo[..., i], hi[..., i]) for i in range(25)]
    # theta
    C = []
    for x in range(5):
        clo, chi = L[x]
        for y in range(1, 5):
            clo = clo ^ L[x + 5 * y][0]
            chi = chi ^ L[x + 5 * y][1]
        C.append((clo, chi))
    for x in range(5):
        rlo, rhi = _rotl(xp, *C[(x + 1) % 5], 1)
        dlo = C[(x - 1) % 5][0] ^ rlo
        dhi = C[(x - 1) % 5][1] ^ rhi
        for y in range(5):
            i = x + 5 * y
            L[i] = (L[i][0] ^ dlo, L[i][1] ^ dhi)
    # rho + pi
    B = [None] * 25
    for x in range(5):
        for y in range(5):
            i = x + 5 * y
            j = y + 5 * ((2 * x + 3 * y) % 5)
            B[j] = _rotl(xp, *L[i], _RHO[i])
    # chi
    for x in range(5):
        for y in range(5):
            i = x + 5 * y
            a1 = B[(x + 1) % 5 + 5 * y]
            a2 = B[(x + 2) % 5 + 5 * y]
            L[i] = (
                B[i][0] ^ ((~a1[0]) & a2[0]),
                B[i][1] ^ ((~a1[1]) & a2[1]),
            )
    # iota
    L[0] = (L[0][0] ^ rc_lo, L[0][1] ^ rc_hi)
    return (
        xp.stack([l[0] for l in L], axis=-1),
        xp.stack([l[1] for l in L], axis=-1),
    )


def keccak_f1600_arrays(xp, lo, hi):
    """lo/hi: (..., 25) uint32 arrays (lane i = lo[..., i] | hi<<32).

    xp: jax.numpy or numpy. Under jnp the 24 rounds run as a lax.scan so
    the compiled graph is one round body (the unrolled form took ~7s of
    XLA compile PER ROUND on the 1-vCPU host).
    """
    if xp is np:
        from ..native import keccakf_batch_u32

        shp = lo.shape
        r = keccakf_batch_u32(lo.reshape(-1, 25), hi.reshape(-1, 25))
        if r is not None:
            return r[0].reshape(shp), r[1].reshape(shp)
        for rc in _RC64:
            lo, hi = _keccak_round(
                np, lo, hi, np.uint32(rc & _M32), np.uint32(rc >> 32)
            )
        return lo, hi

    import jax

    rcs = np.array(
        [[rc & _M32, rc >> 32] for rc in _RC64], dtype=np.uint32
    )

    def body(st, rc):
        nlo, nhi = _keccak_round(xp, st[0], st[1], rc[0], rc[1])
        return (nlo, nhi), None

    (lo, hi), _ = jax.lax.scan(body, (lo, hi), xp.asarray(rcs))
    return lo, hi


# ---------------------------------------------------------------------------
# host (python-int) permutation + Keccak-256 byte hash
# ---------------------------------------------------------------------------
def keccak_f1600_host(lanes):
    """lanes: list of 25 python ints (u64)."""
    a = np.array([x & _M32 for x in lanes], dtype=np.uint32)
    b = np.array([x >> 32 for x in lanes], dtype=np.uint32)
    lo, hi = keccak_f1600_arrays(np, a, b)
    return [int(lo[i]) | (int(hi[i]) << 32) for i in range(25)]


def keccak256(data: bytes) -> bytes:
    """Keccak-256 (original 0x01 padding, NOT sha3-256)."""
    from ..native import keccak256 as keccak256_c

    d = keccak256_c(bytes(data))
    if d is not None:
        return d
    rate = 136
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x00" * pad_len
    padded[len(data)] ^= 0x01
    padded[-1] ^= 0x80
    lanes = [0] * 25
    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i in range(rate // 8):
            lanes[i] ^= int.from_bytes(block[8 * i : 8 * i + 8], "little")
        lanes = keccak_f1600_host(lanes)
    out = b"".join(lanes[i].to_bytes(8, "little") for i in range(4))
    return out[:32]


def keccak256_np_batch(prefix: bytes, candidates: np.ndarray) -> np.ndarray:
    """Keccak-256 of (prefix || cand_le_4bytes) for a batch of u32
    candidates — the vectorized grind kernel for SerializingChallenger32.

    Returns (batch, 32) uint8 digests.
    """
    rate = 136
    n = candidates.shape[0]
    msg_len = len(prefix) + 4
    pad_len = rate - (msg_len % rate)
    total = msg_len + pad_len
    buf = np.zeros((n, total), dtype=np.uint8)
    if prefix:
        buf[:, : len(prefix)] = np.frombuffer(prefix, dtype=np.uint8)
    c = candidates.astype(np.uint32)
    for b in range(4):
        buf[:, len(prefix) + b] = (c >> (8 * b)).astype(np.uint8)
    buf[:, msg_len] ^= 0x01
    buf[:, -1] ^= 0x80

    lo = np.zeros((n, 25), dtype=np.uint32)
    hi = np.zeros((n, 25), dtype=np.uint32)
    for off in range(0, total, rate):
        block = buf[:, off : off + rate]
        words = block.reshape(n, rate // 8, 8).astype(np.uint32)
        blk_lo = (
            words[..., 0] | (words[..., 1] << 8) | (words[..., 2] << 16)
            | (words[..., 3] << 24)
        )
        blk_hi = (
            words[..., 4] | (words[..., 5] << 8) | (words[..., 6] << 16)
            | (words[..., 7] << 24)
        )
        lo[:, : rate // 8] ^= blk_lo
        hi[:, : rate // 8] ^= blk_hi
        lo, hi = keccak_f1600_arrays(np, lo, hi)
    out = np.zeros((n, 32), dtype=np.uint8)
    for i in range(4):
        for b in range(4):
            out[:, 8 * i + b] = (lo[:, i] >> (8 * b)).astype(np.uint8)
            out[:, 8 * i + 4 + b] = (hi[:, i] >> (8 * b)).astype(np.uint8)
    return out


_GRIND_CACHE: dict = {}


def keccak256_grind_device(prefix: bytes, bits: int, cands_wire):
    """Device PoW search for SerializingChallenger32.grind: find the
    first index i with sample_bits(bits) == 0 after
    keccak256(prefix || cands_wire[i]_le). cands_wire are WIRE-form u32s
    (monty for monty-31 fields), in increasing canonical-witness order.
    Returns the index or None.

    One keccak-f[1600] dispatch per batch (the numpy batch kernel left
    the grind host-bound at ~1s/proof on this box's single vCPU).
    Requires the padded message to fit one rate block (prefix ≤ 131
    bytes — always true for the chained-digest transcripts)."""
    import jax

    rate = 136
    msg_len = len(prefix) + 4
    if msg_len > rate - 1:
        return None  # fall back to the numpy path
    base = np.zeros(200, dtype=np.uint8)
    base[: len(prefix)] = np.frombuffer(prefix, dtype=np.uint8)
    base[msg_len] ^= 0x01
    base[rate - 1] ^= 0x80
    words = base.reshape(25, 8).astype(np.uint32)
    base_lo = words[:, 0] | (words[:, 1] << 8) | (words[:, 2] << 16) | (
        words[:, 3] << 24
    )
    base_hi = words[:, 4] | (words[:, 5] << 8) | (words[:, 6] << 16) | (
        words[:, 7] << 24
    )

    batch = int(cands_wire.shape[0])
    lane = len(prefix) // 8
    sb = len(prefix) % 8
    key = (bits, batch, lane, sb)
    fn = _GRIND_CACHE.get(key)
    if fn is None:
        import jax as _jax

        @_jax.jit
        def fn(base_lo, base_hi, cands):
            # lane/sb are STATIC python ints: all shift amounts stay
            # python ints so no uint32->int32 promotion sneaks in (an
            # int32 state would make the keccak rotations arithmetic)
            n = cands.shape[0]
            lo = jnp.broadcast_to(base_lo, (n, 25)).astype(jnp.uint32)
            hi = jnp.broadcast_to(base_hi, (n, 25)).astype(jnp.uint32)
            zero = jnp.zeros_like(cands)
            lo_part = cands << (8 * sb) if sb < 4 else zero
            if sb == 0:
                hi_part = zero
            elif sb < 4:
                hi_part = cands >> (32 - 8 * sb)
            else:
                hi_part = cands << (8 * (sb - 4))
            over_part = cands >> (32 - 8 * (sb - 4)) if sb > 4 else zero
            lo = lo.at[:, lane].set(lo[:, lane] ^ lo_part)
            hi = hi.at[:, lane].set(hi[:, lane] ^ hi_part)
            lo = lo.at[:, lane + 1].set(lo[:, lane + 1] ^ over_part)
            olo, ohi = keccak_f1600_arrays(jnp, lo, hi)
            h3 = ohi[:, 3]
            v = (
                ((h3 & 0xFF) << 24)
                | ((h3 >> 8 & 0xFF) << 16)
                | ((h3 >> 16 & 0xFF) << 8)
                | (h3 >> 24)
            )
            ok = (v & jnp.uint32((1 << bits) - 1)) == 0
            idx = jnp.argmax(ok)
            return idx, ok[idx]

        _GRIND_CACHE[key] = fn

    idx, found = fn(
        jnp.asarray(base_lo), jnp.asarray(base_hi),
        jnp.asarray(cands_wire, dtype=jnp.uint32),
    )
    if bool(found):
        return int(idx)
    return None
