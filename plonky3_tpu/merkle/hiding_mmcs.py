"""Hiding Merkle MMCS — per-leaf random salts.

Mirror of `merkle-tree/src/hiding_mmcs.rs:42` (MerkleTreeHidingMmcs):
commit appends SALT_ELEMS uniformly random columns to every matrix, so
leaf hashes reveal nothing about row contents; opened rows carry their
salts (the verifier hashes the full salted row). Salt randomness comes
from a caller-supplied numpy Generator (the reference takes a CryptoRng).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from .mmcs import MerkleProverData, MerkleTreeMmcs


@dataclass(frozen=True)
class MerkleTreeHidingMmcs:
    inner: MerkleTreeMmcs
    salt_elems: int
    rng: np.random.Generator = field(
        default_factory=lambda: np.random.default_rng()
    )

    @property
    def F(self):
        return self.inner.F

    @property
    def sponge(self):
        return self.inner.sponge

    @property
    def compressor(self):
        return self.inner.compressor

    def _salt(self, h: int):
        F = self.F
        vals = self.rng.integers(0, F.P, size=(h, self.salt_elems),
                                 dtype=np.uint64)
        return jnp.asarray(F.to_monty_np(vals))

    def commit(self, mats, jit_tree: bool = True) -> MerkleProverData:
        salted = []
        for m in mats:
            s = self._salt(m.shape[0])
            if isinstance(m, np.ndarray):
                s = np.asarray(s)
                salted.append(np.concatenate([m, s], axis=1))
            else:
                salted.append(jnp.concatenate([m, jnp.asarray(s)], axis=1))
        data = self.inner.commit(salted, jit_tree=jit_tree)
        data.salt_elems = self.salt_elems
        return data

    # openings pass through — rows include the salt columns
    def open_batch(self, data, index):
        return self.inner.open_batch(data, index)

    def open_batch_many(self, data, indices, want_proofs=True):
        return self.inner.open_batch_many(data, indices, want_proofs)

    def open_multi_batch(self, data, indices):
        return self.inner.open_multi_batch(data, indices)

    # PullBatcher protocol: straight delegation (salt columns are part
    # of the committed matrices, so inner rows already carry them)
    def _omb_plan(self, data, indices):
        return self.inner._omb_plan(data, indices)

    def _omb_finish(self, data, plan, pulled):
        return self.inner._omb_finish(data, plan, pulled)

    def salted_dims(self, dims):
        return [(h, w + self.salt_elems) for (h, w) in dims]

    def verify_batch(self, root_std, dims, index, rows, proof):
        """dims carry the REAL widths; salts ride along in `rows`."""
        return self.inner.verify_batch(
            root_std, self.salted_dims(dims), index, rows, proof
        )

    def verify_multi_batch(self, root_std, dims, indices, rows_pq,
                           sibling_hashes):
        return self.inner.verify_multi_batch(
            root_std, self.salted_dims(dims), indices, rows_pq,
            sibling_hashes,
        )
