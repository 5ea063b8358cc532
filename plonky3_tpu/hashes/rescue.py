"""Rescue-XLIX / RPO permutations (the reference `rescue` crate).

Rescue round (rescue/src/rescue.rs:127-158): S-box x^α -> MDS -> ARK,
then inverse S-box x^{1/α} -> MDS -> ARK. RPO (rpo/mod.rs) reorders to
MDS -> ARK -> S-box per half-round, with an optional concluding linear
step (extra MDS + ARK) after the last round (rpo/koala_bear.rs:59-85).

Round constants derive from SHAKE-256 of a seed string, little-endian
`bytes_per_constant` chunks reduced mod p (rpo/mod.rs:90-110). The MDS
layer reuses the per-field circulant first rows (hashes/poseidon1.py).
Validated against the reference RPO-KoalaBear test vector
(rpo/koala_bear.rs:182).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from ..fields.monty31 import Monty31
from .constants.poseidon1_constants import KOALABEAR_MDS_FIRST_ROW_24
from .poseidon1 import Poseidon1  # reuse its circulant MDS machinery


def shake_round_constants(F, seed: bytes, width: int, num_rounds: int,
                          bytes_per_constant: int,
                          include_final_layer: bool):
    n = 2 * width * num_rounds + (width if include_final_layer else 0)
    raw = hashlib.shake_256(seed).digest(bytes_per_constant * n)
    out = []
    for i in range(n):
        chunk = raw[i * bytes_per_constant : (i + 1) * bytes_per_constant]
        out.append(int.from_bytes(chunk, "little") % F.P)
    return out


def _mds_host(F, first_row, state):
    P, w = F.P, len(state)
    return [
        sum(first_row[(j - i) % w] * state[j] for j in range(w)) % P
        for i in range(w)
    ]


@dataclass(frozen=True)
class Rescue:
    """Rescue-XLIX (rescue.rs permute_mut ordering)."""

    F: Monty31
    width: int
    alpha: int
    num_rounds: int
    round_constants: tuple  # flat, 2·width·num_rounds
    mds_first_row: tuple

    def __post_init__(self):
        object.__setattr__(
            self, "alpha_inv", pow(self.alpha, -1, self.F.P - 1)
        )

    def permute_host(self, state):
        P, w = self.F.P, self.width
        rc = self.round_constants
        state = [x % P for x in state]
        for r in range(self.num_rounds):
            state = [pow(x, self.alpha, P) for x in state]
            state = _mds_host(self.F, self.mds_first_row, state)
            state = [
                (x + rc[r * 2 * w + i]) % P for i, x in enumerate(state)
            ]
            state = [pow(x, self.alpha_inv, P) for x in state]
            state = _mds_host(self.F, self.mds_first_row, state)
            state = [
                (x + rc[r * 2 * w + w + i]) % P
                for i, x in enumerate(state)
            ]
        return state


@dataclass(frozen=True)
class RpoKoalaBear:
    """RPO over KoalaBear, width 24, 7 rounds, concluding linear step
    (rpo/koala_bear.rs; seed RPO-KB:p=2130706433,m=24,c=8,n=7)."""

    F: Monty31
    width: int = 24
    alpha: int = 3
    num_rounds: int = 7

    def __post_init__(self):
        seed = (
            f"RPO-KB:p={self.F.P},m={self.width},c=8,n={self.num_rounds}"
        ).encode()
        rcs = shake_round_constants(
            self.F, seed, self.width, self.num_rounds, 5, True
        )
        object.__setattr__(self, "rcs", rcs)
        object.__setattr__(
            self, "alpha_inv", pow(self.alpha, -1, self.F.P - 1)
        )

    def permute_host(self, state):
        P, w = self.F.P, self.width
        row = KOALABEAR_MDS_FIRST_ROW_24
        rcs = self.rcs
        state = [x % P for x in state]
        for r in range(self.num_rounds):
            state = _mds_host(self.F, row, state)
            state = [
                (x + rcs[2 * r * w + i]) % P for i, x in enumerate(state)
            ]
            state = [pow(x, self.alpha, P) for x in state]
            state = _mds_host(self.F, row, state)
            state = [
                (x + rcs[(2 * r + 1) * w + i]) % P
                for i, x in enumerate(state)
            ]
            state = [pow(x, self.alpha_inv, P) for x in state]
        state = _mds_host(self.F, row, state)
        state = [
            (x + rcs[2 * self.num_rounds * w + i]) % P
            for i, x in enumerate(state)
        ]
        return state

    def permute_np(self, states):
        """Batched numpy permutation (..., 24) canonical u32."""
        F = self.F
        w = self.width
        row = np.array(KOALABEAR_MDS_FIRST_ROW_24, dtype=np.uint64)
        mds = np.array(
            [[row[(j - i) % w] for j in range(w)] for i in range(w)],
            dtype=np.uint64,
        )
        rcs = np.array(self.rcs, dtype=np.uint64)
        P = np.uint64(F.P)

        def mds_mul(x):
            # safe: products < 2^62; chunk the sum mod P
            acc = np.zeros(x.shape, np.uint64)
            prods = (x[..., None, :].astype(np.uint64) * mds) % P
            return prods.sum(axis=-1) % P

        def exp(x, e):
            acc = np.ones_like(x)
            base = x.copy()
            while e:
                if e & 1:
                    acc = (acc * base) % P
                base = (base * base) % P
                e >>= 1
            return acc

        x = np.asarray(states, dtype=np.uint64) % P
        for r in range(self.num_rounds):
            x = (mds_mul(x) + rcs[2 * r * w : (2 * r + 1) * w]) % P
            x = exp(x, self.alpha)
            x = (mds_mul(x) + rcs[(2 * r + 1) * w : (2 * r + 2) * w]) % P
            x = exp(x, self.alpha_inv)
        x = (mds_mul(x) + rcs[2 * self.num_rounds * w :]) % P
        return x.astype(np.uint32)
