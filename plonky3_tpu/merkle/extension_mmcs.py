"""ExtensionMmcs: commit to extension-field matrices via a base-field MMCS.

Mirrors `commit/src/adapters/extension_mmcs.rs:17`: an (h, w, D) extension
matrix is committed as the flattened (h, w·D) base matrix (component-major
within each element, matching `flatten_to_base`), and opened rows are
re-grouped into D-tuples.
"""

from __future__ import annotations

from dataclasses import dataclass

from .mmcs import MerkleTreeMmcs, MerkleProverData


@dataclass(frozen=True)
class ExtensionMmcs:
    inner: MerkleTreeMmcs
    D: int
    # wire u32 columns per ext element (== D for 31-bit fields; 2·D for
    # Goldilocks, whose elements span two limb lanes — gl/field.py)
    wire_cols: int = 0

    @property
    def _wc(self) -> int:
        return self.wire_cols or self.D

    def commit_ext_matrix(self, mat) -> MerkleProverData:
        """mat: (h, w, wire_cols) device uint32 -> commit flattened.

        jit_tree=False: FRI commits one matrix per round at a fresh height
        each time; the eager ladder shares the shape-cached permutation
        compiles across rounds instead of compiling a tree program per
        height."""
        import numpy as _np

        h, w, d = mat.shape
        assert d == self._wc
        # device: ONE jitted tree program per (h, w) shape — with the
        # persistent compile cache this costs one compile ever and one
        # dispatch per round (vs ~log h eager dispatches, which dominated
        # the FRI commit phase through the axon tunnel)
        mode = "np" if isinstance(mat, _np.ndarray) else True
        return self.inner.commit([mat.reshape(h, w * d)], jit_tree=mode)

    def commit_ext_matrices(self, mats, jit_tree=False) -> MerkleProverData:
        """Commit several (h_i, w_i, D) ext matrices in ONE tree (mixed
        heights; the circle PCS first-layer commitment)."""
        import numpy as _np

        flat = []
        for mat in mats:
            h, w, d = mat.shape
            assert d == self._wc
            flat.append(mat.reshape(h, w * d))
        if all(isinstance(m, _np.ndarray) for m in flat):
            jit_tree = "np"
        return self.inner.commit(flat, jit_tree=jit_tree)

    def open_batch(self, data: MerkleProverData, index: int):
        rows, proof = self.inner.open_batch(data, index)
        # regroup base values into extension tuples
        ext_rows = []
        for row in rows:
            assert len(row) % self.D == 0
            ext_rows.append(
                [
                    tuple(row[i : i + self.D])
                    for i in range(0, len(row), self.D)
                ]
            )
        return ext_rows, proof

    def open_batch_many(self, data: MerkleProverData, indices):
        """Batched variant of open_batch (one transfer per matrix)."""
        rows_pq, proofs_pq = self.inner.open_batch_many(data, indices)
        ext_pq = []
        for rows in rows_pq:
            ext_rows = []
            for row in rows:
                assert len(row) % self.D == 0
                ext_rows.append(
                    [
                        tuple(row[i : i + self.D])
                        for i in range(0, len(row), self.D)
                    ]
                )
            ext_pq.append(ext_rows)
        return ext_pq, proofs_pq

    def verify_batch(self, root_std, dims, index, ext_rows, proof) -> bool:
        """dims: list of (height, ext_width)."""
        rows = [
            [c for e in row for c in e] for row in ext_rows
        ]
        base_dims = [(h, w * self.D) for (h, w) in dims]
        return self.inner.verify_batch(root_std, base_dims, index, rows, proof)

    def open_multi_batch(self, data: MerkleProverData, indices):
        """Pruned multi-opening of ext rows (one shared proof)."""
        rows_pq, sibling_hashes = self.inner.open_multi_batch(data, indices)
        return self._regroup(rows_pq), sibling_hashes

    def _regroup(self, rows_pq):
        ext_pq = []
        for rows in rows_pq:
            ext_rows = []
            for row in rows:
                assert len(row) % self.D == 0
                ext_rows.append(
                    [
                        tuple(row[i : i + self.D])
                        for i in range(0, len(row), self.D)
                    ]
                )
            ext_pq.append(ext_rows)
        return ext_pq

    # PullBatcher protocol: delegate the gather plan to the inner tree,
    # regroup base rows into extension tuples at finish time
    def _omb_plan(self, data, indices):
        return self.inner._omb_plan(data, indices)

    def _omb_finish(self, data, plan, pulled):
        rows_pq, sibs = self.inner._omb_finish(data, plan, pulled)
        return self._regroup(rows_pq), sibs

    def verify_multi_batch(
        self, root_std, dims, indices, ext_rows_pq, sibling_hashes
    ) -> bool:
        rows_pq = [
            [[c for e in row for c in e] for row in ext_rows]
            for ext_rows in ext_rows_pq
        ]
        base_dims = [(h, w * self.D) for (h, w) in dims]
        return self.inner.verify_multi_batch(
            root_std, base_dims, indices, rows_pq, sibling_hashes
        )
