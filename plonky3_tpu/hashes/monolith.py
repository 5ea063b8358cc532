"""Monolith-31 permutation over Mersenne31 (the `monolith` crate).

Structure (monolith/src/monolith.rs:1-24):
    Concrete; then 5x (Bars -> Bricks -> Concrete -> AddRC); then
    Bars -> Bricks -> Concrete.
Bars (bars/mersenne31.rs): chi-like S-boxes on (8,8,8,7)-bit buckets of
the first 8 lanes, realized as two 16-bit lookup tables — on device/np
the lookups are table gathers over u16 halves. Bricks: s_i += s_{i-1}^2.
Concrete: the paper's 16x16 circulant (mds/mersenne31.rs:63). Round
constants: SHAKE-128("Monolith" || width || rounds || p || limbs) with
rejection sampling (monolith.rs:88-101). Validated against the paper KAT
(monolith.rs:209).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from ..fields.mersenne31 import Mersenne31 as F

_P = F.P

MDS_ROW_16 = (
    61402, 17845, 26798, 59689, 12021, 40901, 41351, 27521, 56951,
    12034, 53865, 43244, 7454, 33823, 28750, 1108,
)


def _s_box8(y: int) -> int:
    def rotl8(v, r):
        return ((v << r) | (v >> (8 - r))) & 0xFF

    tmp = y ^ (~rotl8(y, 1) & rotl8(y, 2) & rotl8(y, 3)) & 0xFF
    tmp &= 0xFF
    return rotl8(tmp, 1)


def _s_box7(y: int) -> int:
    r1 = ((y >> 6) | (y << 1)) & 0x7F
    r2 = ((y >> 5) | (y << 2)) & 0x7F
    tmp = (y ^ (~r1 & r2)) & 0x7F
    return ((tmp >> 6) | (tmp << 1)) & 0x7F


_LOW16 = np.array(
    [
        (_s_box8(i >> 8) << 8) | _s_box8(i & 0xFF)
        for i in range(1 << 16)
    ],
    dtype=np.uint32,
)
_HIGH15 = np.array(
    [
        (_s_box7(i >> 8) << 8) | _s_box8(i & 0xFF)
        for i in range(1 << 15)
    ],
    dtype=np.uint32,
)


def _shake_constants(width: int, num_full_rounds: int):
    shake = hashlib.shake_128()
    shake.update(b"Monolith")
    shake.update(bytes([width, num_full_rounds + 1]))
    shake.update(_P.to_bytes(4, "little"))
    shake.update(bytes([8, 8, 8, 7]))
    stream = shake.digest(16 * width * num_full_rounds * 8)
    pos = 0
    out = []
    for _ in range(num_full_rounds):
        rcs = []
        while len(rcs) < width:
            v = int.from_bytes(stream[pos : pos + 4], "little")
            pos += 4
            if v < _P:
                rcs.append(v)
        out.append(tuple(rcs))
    return tuple(out)


@dataclass(frozen=True)
class MonolithM31:
    width: int = 16
    num_full_rounds: int = 5
    num_bars: int = 8

    def __post_init__(self):
        assert self.width == 16, "circulant path implemented for width 16"
        object.__setattr__(
            self, "rc", _shake_constants(self.width, self.num_full_rounds)
        )

    # ---- host ----
    def _bar(self, v: int) -> int:
        return (int(_HIGH15[v >> 16]) << 16) | int(_LOW16[v & 0xFFFF])

    def _concrete(self, state):
        w = self.width
        return [
            sum(MDS_ROW_16[(j - i) % w] * state[j] for j in range(w)) % _P
            for i in range(w)
        ]

    def permute_host(self, state):
        state = [x % _P for x in state]
        state = self._concrete(state)
        for r in range(self.num_full_rounds + 1):
            state = [
                self._bar(x) if i < self.num_bars else x
                for i, x in enumerate(state)
            ]
            for i in range(self.width - 1, 0, -1):
                state[i] = (state[i] + state[i - 1] * state[i - 1]) % _P
            state = self._concrete(state)
            if r < self.num_full_rounds:
                state = [
                    (x + c) % _P for x, c in zip(state, self.rc[r])
                ]
        return state

    # ---- numpy batched ----
    def permute_np(self, states):
        x = np.asarray(states, dtype=np.uint64) % _P
        w = self.width
        mds = np.array(
            [[MDS_ROW_16[(j - i) % w] for j in range(w)] for i in range(w)],
            dtype=np.uint64,
        )

        def concrete(v):
            return ((v[..., None, :] * mds) % _P).sum(axis=-1) % _P

        def bars(v):
            b = v[..., : self.num_bars].astype(np.uint32)
            lo = _LOW16[b & 0xFFFF]
            hi = _HIGH15[b >> 16]
            nb = ((hi << 16) | lo).astype(np.uint64)
            return np.concatenate([nb, v[..., self.num_bars :]], axis=-1)

        x = concrete(x)
        for r in range(self.num_full_rounds + 1):
            x = bars(x)
            for i in range(w - 1, 0, -1):
                x[..., i] = (
                    x[..., i] + x[..., i - 1] * x[..., i - 1]
                ) % _P
            x = concrete(x)
            if r < self.num_full_rounds:
                x = (x + np.array(self.rc[r], dtype=np.uint64)) % _P
        return x.astype(np.uint32)


# ---------------------------------------------------------------------------
# Monolith-64 (Goldilocks), LOOKUP_BITS = 8 (monolith/src/bars/goldilocks.rs)
# ---------------------------------------------------------------------------
_GL_P = (1 << 64) - (1 << 32) + 1
MDS_ROW_8_GL = (23, 8, 13, 10, 7, 6, 21, 8)
MDS_ROW_12_GL = (7, 23, 8, 26, 13, 10, 9, 7, 6, 22, 21, 8)
_M64 = (1 << 64) - 1


def _bar64_swar8(val: int) -> int:
    """SWAR chi on eight 8-bit lanes + final intra-lane rotl1
    (bars/goldilocks.rs:48-68)."""
    val &= _M64
    nv = (~val) & _M64
    rot1 = ((nv & 0x8080808080808080) >> 7) | (
        (nv & 0x7F7F7F7F7F7F7F7F) << 1
    )
    rot2 = ((val & 0xC0C0C0C0C0C0C0C0) >> 6) | (
        (val & 0x3F3F3F3F3F3F3F3F) << 2
    )
    rot3 = ((val & 0xE0E0E0E0E0E0E0E0) >> 5) | (
        (val & 0x1F1F1F1F1F1F1F1F) << 3
    )
    tmp = val ^ (rot1 & rot2 & rot3 & _M64)
    return (
        ((tmp & 0x8080808080808080) >> 7)
        | ((tmp & 0x7F7F7F7F7F7F7F7F) << 1)
    ) & _M64


def _shake_constants_gl(width: int, num_full_rounds: int):
    """SHAKE-128("Monolith" || width || rounds || p_le8 || [8]*8) with
    u64 rejection sampling (monolith.rs:87-100, util.rs:14)."""
    shake = hashlib.shake_128()
    shake.update(b"Monolith")
    shake.update(bytes([width, num_full_rounds + 1]))
    shake.update(_GL_P.to_bytes(8, "little"))
    shake.update(bytes([8] * 8))
    stream = shake.digest(16 * width * num_full_rounds * 16)
    pos = 0
    out = []
    for _ in range(num_full_rounds):
        rcs = []
        while len(rcs) < width:
            v = int.from_bytes(stream[pos : pos + 8], "little")
            pos += 8
            if v < _GL_P:
                rcs.append(v)
        out.append(tuple(rcs))
    return tuple(out)


@dataclass(frozen=True)
class MonolithGoldilocks:
    """Monolith-64 over Goldilocks, LOOKUP_BITS=8, 4 Bars, 5+1 rounds
    (monolith/src/monolith.rs:181 MonolithGoldilocks8; width 8 =
    compression mode, 12 = sponge mode). Host-exact; the width-12
    instance reproduces the HorizenLabs known-answer vector."""

    width: int = 12
    num_full_rounds: int = 5
    num_bars: int = 4

    def __post_init__(self):
        assert self.width in (8, 12)
        object.__setattr__(
            self, "rc",
            _shake_constants_gl(self.width, self.num_full_rounds),
        )
        object.__setattr__(
            self, "mds_row",
            MDS_ROW_8_GL if self.width == 8 else MDS_ROW_12_GL,
        )

    def _concrete(self, state):
        w, row = self.width, self.mds_row
        return [
            sum(row[(j - i) % w] * state[j] for j in range(w)) % _GL_P
            for i in range(w)
        ]

    def permute_host(self, state):
        state = [x % _GL_P for x in state]
        state = self._concrete(state)
        for r in range(self.num_full_rounds + 1):
            state = [
                _bar64_swar8(x) if i < self.num_bars else x
                for i, x in enumerate(state)
            ]
            for i in range(self.width - 1, 0, -1):
                state[i] = (state[i] + state[i - 1] * state[i - 1]) % _GL_P
            state = self._concrete(state)
            if r < self.num_full_rounds:
                state = [
                    (x + c) % _GL_P for x, c in zip(state, self.rc[r])
                ]
        return state
