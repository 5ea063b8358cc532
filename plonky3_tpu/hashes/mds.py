"""MDS matrix permutations (the reference `mds` crate).

The reference implements three evaluation strategies for circulant MDS
matrices — Reed-Solomon coset evaluation via Bowers butterflies
(mds/src/coset_mds.rs:25), integrated coset shifts, and Karatsuba
circulant convolution (karatsuba_convolution.rs) — all CPU tricks to
avoid the O(w²) dense product. On TPU the dense w×w product IS the right
primitive (one small matmul per state batch), so this module exposes the
circulant as an explicit matrix with host/numpy/device paths; per-field
first rows live with their field's constants.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CirculantMds:
    """M[i][j] = first_row[(j - i) mod w] (mds/src/util.rs
    first_row_to_first_col convention, validated by the Poseidon1 and
    Monolith reference KATs)."""

    F: object
    first_row: tuple

    @property
    def width(self):
        return len(self.first_row)

    def _matrix_np(self):
        w = self.width
        return np.array(
            [
                [self.first_row[(j - i) % w] % self.F.P for j in range(w)]
                for i in range(w)
            ],
            dtype=np.uint64,
        )

    def permute_host(self, state):
        P, w = self.F.P, self.width
        row = self.first_row
        return [
            sum(row[(j - i) % w] * state[j] for j in range(w)) % P
            for i in range(w)
        ]

    def permute_np(self, states):
        m = self._matrix_np()
        x = np.asarray(states, dtype=np.uint64)
        return (((x[..., None, :] * m) % self.F.P).sum(axis=-1)
                % self.F.P).astype(np.uint32)

    def permute_device(self, states):
        """states (..., w) wire-form uint32 (Monty for Monty31 fields)."""
        F = self.F
        m = jnp.asarray(F.to_monty_np(self._matrix_np() % F.P))
        prods = F.mul(states[..., None, :], m)
        return F.sum(prods, axis=-1)
