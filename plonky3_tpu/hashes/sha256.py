"""SHA-256 hasher + padding-free compression (reference `sha256` crate).

Mirrors `sha256/src/lib.rs:14,43`: the hasher wraps the platform
implementation (hashlib, like the reference wraps the `sha2` crate);
`Sha256Compress` is the raw compression function on a (8 x u32 state,
16 x u32 block) pair — implemented directly since hashlib doesn't expose
it, usable batched via numpy for trace generation (sha256-air).
"""

from __future__ import annotations

import hashlib

import numpy as np

_K = np.array([
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B,
    0x59F111F1, 0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01,
    0x243185BE, 0x550C7DC3, 0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7,
    0xC19BF174, 0xE49B69C1, 0xEFBE4786, 0x0FC19DC6, 0x240CA1CC,
    0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA, 0x983E5152,
    0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC,
    0x53380D13, 0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85,
    0xA2BFE8A1, 0xA81A664B, 0xC24B8B70, 0xC76C51A3, 0xD192E819,
    0xD6990624, 0xF40E3585, 0x106AA070, 0x19A4C116, 0x1E376C08,
    0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A, 0x5B9CCA4F,
    0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
], dtype=np.uint32)

IV = np.array([
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
], dtype=np.uint32)


def sha256(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def _rotr(xp, x, r):
    return (x >> np.uint32(r)) | (x << np.uint32(32 - r))


def compress_arrays(xp, state, block):
    """One compression: state (..., 8), block (..., 16) uint32 (big-endian
    word convention, as in the FIPS spec)."""
    w = [block[..., i] for i in range(16)]
    for i in range(16, 64):
        s0 = _rotr(xp, w[i - 15], 7) ^ _rotr(xp, w[i - 15], 18) ^ (
            w[i - 15] >> np.uint32(3)
        )
        s1 = _rotr(xp, w[i - 2], 17) ^ _rotr(xp, w[i - 2], 19) ^ (
            w[i - 2] >> np.uint32(10)
        )
        w.append(w[i - 16] + s0 + w[i - 7] + s1)
    a, b, c, d, e, f, g, h = [state[..., i] for i in range(8)]
    for i in range(64):
        S1 = _rotr(xp, e, 6) ^ _rotr(xp, e, 11) ^ _rotr(xp, e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + np.uint32(_K[i]) + w[i]
        S0 = _rotr(xp, a, 2) ^ _rotr(xp, a, 13) ^ _rotr(xp, a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    out = [a, b, c, d, e, f, g, h]
    return xp.stack(
        [state[..., i] + out[i] for i in range(8)], axis=-1
    )


def sha256_compress(state_words, block_words):
    """Padding-free compression on python ints (Sha256Compress,
    sha256/src/lib.rs:43)."""
    with np.errstate(over="ignore"):
        out = compress_arrays(
            np,
            np.array(state_words, dtype=np.uint32),
            np.array(block_words, dtype=np.uint32),
        )
    return [int(x) for x in out]
