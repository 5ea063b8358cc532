"""Bit-twiddling utilities.

Behavioral parity with the reference's `util/src/lib.rs` (log2_strict_usize:78,
reverse_bits_len:203, reverse_slice_index_bits:239), re-designed for XLA:
the bit-reversal permutation is realized as a static reshape/transpose, never
a gather.
"""

from __future__ import annotations

import numpy as np


def log2_strict(n: int) -> int:
    """log2 of a power of two; raises otherwise. (util/src/lib.rs:78)"""
    k = n.bit_length() - 1
    if n <= 0 or (1 << k) != n:
        raise ValueError(f"{n} is not a positive power of two")
    return k


def log2_ceil(n: int) -> int:
    if n <= 0:
        raise ValueError("n must be positive")
    return (n - 1).bit_length()


def reverse_bits_len(x: int, bit_len: int) -> int:
    """Reverse the low `bit_len` bits of x. (util/src/lib.rs:203)"""
    r = 0
    for _ in range(bit_len):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def bitrev_indices(log_n: int) -> np.ndarray:
    """Length-2^log_n int32 array: i -> reverse_bits_len(i, log_n)."""
    n = 1 << log_n
    idx = np.arange(n, dtype=np.int64)
    r = np.zeros(n, dtype=np.int64)
    for _ in range(log_n):
        r = (r << 1) | (idx & 1)
        idx >>= 1
    return r.astype(np.int32)


def bitrev_permute_axis0(x, log_n: int):
    """Bit-reversal permutation of axis 0 as reshape+transpose (no gather).

    View the axis of length 2^k as k axes of size 2, reverse them, flatten.
    XLA lowers this to efficient tiled transposes on TPU, unlike a gather.
    """
    if log_n == 0:
        return x
    lead = (2,) * log_n
    rest = x.shape[1:]
    y = x.reshape(lead + rest)
    perm = tuple(range(log_n - 1, -1, -1)) + tuple(
        range(log_n, log_n + len(rest))
    )
    return y.transpose(perm).reshape(x.shape)
