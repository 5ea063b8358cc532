"""BLAKE3 compression + single-chunk hashing, on uint32 word lanes.

The reference's `blake3` crate is a thin wrapper over the upstream native
implementation (`blake3/src/lib.rs:9`); here the compression function is
implemented directly (BLAKE3 spec §2.1-2.3) so it can run batched on
device (one state per row — the TPU analog of the upstream SIMD paths)
and exactly on host for verification. Covers hashing of inputs up to one
chunk (1024 bytes) plus the parent/root modes needed for longer inputs.

The same compression round structure feeds `models/blake3_air.py`.
"""

from __future__ import annotations

import numpy as np

IV = np.array(
    [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ],
    dtype=np.uint32,
)

# flags
CHUNK_START = 1 << 0
CHUNK_END = 1 << 1
PARENT = 1 << 2
ROOT = 1 << 3

# message schedule permutation applied between rounds
_PERM = [2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8]


def _rotr(xp, x, r):
    u = np.uint32(r)
    c = np.uint32(32 - r)
    return (x >> u) | (x << c)


def _g(xp, state, a, b, c, d, mx, my):
    state[a] = state[a] + state[b] + mx
    state[d] = _rotr(xp, state[d] ^ state[a], 16)
    state[c] = state[c] + state[d]
    state[b] = _rotr(xp, state[b] ^ state[c], 12)
    state[a] = state[a] + state[b] + my
    state[d] = _rotr(xp, state[d] ^ state[a], 8)
    state[c] = state[c] + state[d]
    state[b] = _rotr(xp, state[b] ^ state[c], 7)


def compress_arrays(xp, cv, block_words, counter_lo, counter_hi,
                    block_len, flags):
    """BLAKE3 compression on (..., 8) cv and (..., 16) block word arrays.

    counter/block_len/flags: scalars or (...,) uint32 arrays.
    Returns the full 16-word output (truncate to 8 for chaining).
    """
    m = [block_words[..., i] for i in range(16)]
    zeros = xp.zeros_like(m[0])
    state = [
        cv[..., 0], cv[..., 1], cv[..., 2], cv[..., 3],
        cv[..., 4], cv[..., 5], cv[..., 6], cv[..., 7],
        zeros + np.uint32(IV[0]), zeros + np.uint32(IV[1]),
        zeros + np.uint32(IV[2]), zeros + np.uint32(IV[3]),
        zeros + np.uint32(counter_lo) if np.isscalar(counter_lo)
        else counter_lo.astype(np.uint32) + zeros,
        zeros + np.uint32(counter_hi) if np.isscalar(counter_hi)
        else counter_hi.astype(np.uint32) + zeros,
        zeros + np.uint32(block_len) if np.isscalar(block_len)
        else block_len.astype(np.uint32) + zeros,
        zeros + np.uint32(flags) if np.isscalar(flags)
        else flags.astype(np.uint32) + zeros,
    ]
    for rnd in range(7):
        _g(xp, state, 0, 4, 8, 12, m[0], m[1])
        _g(xp, state, 1, 5, 9, 13, m[2], m[3])
        _g(xp, state, 2, 6, 10, 14, m[4], m[5])
        _g(xp, state, 3, 7, 11, 15, m[6], m[7])
        _g(xp, state, 0, 5, 10, 15, m[8], m[9])
        _g(xp, state, 1, 6, 11, 12, m[10], m[11])
        _g(xp, state, 2, 7, 8, 13, m[12], m[13])
        _g(xp, state, 3, 4, 9, 14, m[14], m[15])
        if rnd < 6:
            m = [m[_PERM[i]] for i in range(16)]
    out = [state[i] ^ state[i + 8] for i in range(8)] + [
        state[i + 8] ^ cv[..., i] for i in range(8)
    ]
    return xp.stack(out, axis=-1)


def compress_device(cv, block_words, counter_lo=0, counter_hi=0,
                    block_len=64, flags=0):
    """Batched device compression: cv (..., 8), block (..., 16) uint32."""
    import jax.numpy as jnp

    return compress_arrays(
        jnp, cv, block_words, counter_lo, counter_hi, block_len, flags
    )


def _words_le(data: bytes) -> list[int]:
    assert len(data) % 4 == 0
    return [
        int.from_bytes(data[i : i + 4], "little")
        for i in range(0, len(data), 4)
    ]


def _compress_host(cv, block_words, counter, block_len, flags):
    cv_a = np.array(cv, dtype=np.uint32)
    bw = np.array(block_words, dtype=np.uint32)
    with np.errstate(over="ignore"):
        out = compress_arrays(
            np, cv_a, bw, counter & 0xFFFFFFFF, counter >> 32, block_len,
            flags,
        )
    return [int(x) for x in out]


def blake3(data: bytes, out_len: int = 32) -> bytes:
    """BLAKE3 hash (host, exact; arbitrary length via chunk tree)."""
    CHUNK = 1024
    chunks = [data[i : i + CHUNK] for i in range(0, len(data), CHUNK)]
    if not chunks:
        chunks = [b""]

    def chunk_cv(chunk: bytes, counter: int, is_only: bool):
        blocks = [chunk[i : i + 64] for i in range(0, len(chunk), 64)]
        if not blocks:
            blocks = [b""]
        cv = list(IV)
        for i, blk in enumerate(blocks):
            block_len = len(blk)
            padded = blk + b"\x00" * (64 - len(blk))
            flags = 0
            if i == 0:
                flags |= CHUNK_START
            if i == len(blocks) - 1:
                flags |= CHUNK_END
                if is_only:
                    flags |= ROOT
            out = _compress_host(
                cv, _words_le(padded), counter, block_len, flags
            )
            if i == len(blocks) - 1 and is_only:
                return out  # root output (16 words for XOF)
            cv = out[:8]
        return cv

    if len(chunks) == 1:
        out = chunk_cv(chunks[0], 0, True)
        return b"".join(
            int(x).to_bytes(4, "little") for x in out
        )[:out_len]

    # parent tree: left subtree gets the largest power of two < count
    # (spec §2.1)
    cvs = [chunk_cv(c, i, False) for i, c in enumerate(chunks)]

    def build(nodes, root):
        if len(nodes) == 1:
            return nodes[0]
        split = 1 << (len(nodes) - 1).bit_length() - 1
        left = build(nodes[:split], False)
        right = build(nodes[split:], False)
        out = _compress_host(
            list(IV), left[:8] + right[:8], 0, 64,
            PARENT | (ROOT if root else 0),
        )
        return out

    out = build(cvs, True)
    return b"".join(int(x).to_bytes(4, "little") for x in out)[:out_len]
