"""Poseidon2 over Goldilocks, width 8 (host exact + numpy batch).

Mirrors `goldilocks/src/poseidon2.rs`: S-box x^7
(`poseidon1.rs` GOLDILOCKS_S_BOX_DEGREE), 4+4 full rounds + 22 partial
rounds, MDSMat4-based external light MDS (`poseidon2/src/external.rs:
96-112,135-170`), internal layer out_i = sum + diag_i·s_i with the
vendored MATRIX_DIAG_8 (`poseidon2.rs:708,779`). Round constants are
machine-extracted normative data
(hashes/constants/poseidon2_goldilocks_constants.py). Verified against
the reference's width-8 KAT (`poseidon2.rs:1236-1253`).
"""

from __future__ import annotations

import numpy as np

from ..fields.goldilocks import Goldilocks
from .constants.poseidon2_goldilocks_constants import (
    MATRIX_DIAG_8,
    RC8_EXTERNAL_FINAL,
    RC8_EXTERNAL_INITIAL,
    RC8_INTERNAL,
)

P = Goldilocks.P
WIDTH = 8


def _sbox7(x: int) -> int:
    x2 = (x * x) % P
    x4 = (x2 * x2) % P
    return (x4 * x2 % P) * x % P


def _apply_mat4(x):
    """MDSMat4 (external.rs:96: [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]]),
    computed with the reference's add/double schedule."""
    t01 = (x[0] + x[1]) % P
    t23 = (x[2] + x[3]) % P
    t0123 = (t01 + t23) % P
    t01123 = (t0123 + x[1]) % P
    t01233 = (t0123 + x[3]) % P
    return [
        (t01123 + t01) % P,       # 2a + 3b + c + d
        (t01123 + 2 * x[2]) % P,  # a + 2b + 3c + d
        (t01233 + t23) % P,       # a + b + 2c + 3d
        (t01233 + 2 * x[0]) % P,  # 3a + b + c + 2d
    ]


def _mds_light(s):
    """Width-8 external linear layer (external.rs:135-170)."""
    a = _apply_mat4(s[0:4])
    b = _apply_mat4(s[4:8])
    out = []
    for i in range(4):
        tot = (a[i] + b[i]) % P
        out.append((a[i] + tot) % P)
    for i in range(4):
        tot = (a[i] + b[i]) % P
        out.append((b[i] + tot) % P)
    return out


def _internal(s):
    total = sum(s) % P
    return [(total + MATRIX_DIAG_8[i] * s[i]) % P for i in range(8)]


def poseidon2_goldilocks_permute(state):
    """[8] canonical u64 ints -> [8]."""
    s = [int(x) % P for x in state]
    s = _mds_light(s)
    for rc in RC8_EXTERNAL_INITIAL:
        s = [_sbox7((x + c) % P) for x, c in zip(s, rc)]
        s = _mds_light(s)
    for c in RC8_INTERNAL:
        s[0] = _sbox7((s[0] + c) % P)
        s = _internal(s)
    for rc in RC8_EXTERNAL_FINAL:
        s = [_sbox7((x + c) % P) for x, c in zip(s, rc)]
        s = _mds_light(s)
    return s


def poseidon2_goldilocks_permute_np(states: np.ndarray) -> np.ndarray:
    """(n, 8) object/u64 batch via python-int vector ops (the numpy u64
    path cannot hold 128-bit products; object dtype keeps exactness —
    this serves digest-sized host work, the device path is the 31-bit
    fields' job)."""
    out = np.empty_like(states, dtype=object)
    for i in range(states.shape[0]):
        out[i] = poseidon2_goldilocks_permute(
            [int(x) for x in states[i]]
        )
    return out
