"""Merkle-tree MMCS: batched device build, exact host verification.

TPU re-design of `merkle-tree/src/merkle_tree.rs:95` + `mmcs/batch.rs:42`:
the whole tree is built as log(h) batched Poseidon2 calls on device — the
leaf layer hashes every row at once ((h, WIDTH) lanes, replacing the
reference's packed-SIMD `first_digest_layer`), each compression layer halves
the digest count. Mixed-height matrix *injection* (`compress_and_inject`,
merkle_tree.rs:141-170) is supported on the power-of-two ladder: matrices
whose height equals the current layer's digest count are hashed and
compressed into that layer, matching the reference's leaf ordering
(taller matrices first).

Openings/verification run on the host with exact integer Poseidon2 —
they are O(log h) per query.

Current limits vs the reference: arity is fixed at 2 (no arity schedule /
Merkle caps yet), heights must be powers of two, and `open_multi_batch`
dedup is not implemented.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..hashes.sponge import PaddingFreeSponge, TruncatedPermutation
from ..utils.bits import log2_strict


@dataclass
class MerkleProverData:
    matrices: list  # committed device matrices (rows in committed order)
    layers: list  # device digest layers, layers[0] = leaves (h, 8)
    root_std: tuple  # digest as standard-form ints (host)
    digest_is_field: bool = True
    _layers_np: list = None  # lazily pulled host copies for fast openings
    # Merkle cap (merkle_tree.rs:182-198): the commitment is the layer
    # cap_height levels below the root — 2^cap_height digests; proofs are
    # cap_height siblings shorter. cap_std[i] is a standard-form digest
    # tuple; for cap_height 0, cap_std == (root_std,).
    cap_std: tuple = None

    def host_layers(self, F):
        if self._layers_np is None:
            conv = F.from_monty_np if self.digest_is_field else np.asarray
            self._layers_np = [conv(np.asarray(l)) for l in self.layers]
        return self._layers_np

    @property
    def commitment(self):
        """Wire commitment: the root digest for cap_height 0, else the
        MerkleCap — a tuple of digests (symmetric/src/hash.rs:27)."""
        if self.cap_std is not None and len(self.cap_std) > 1:
            return self.cap_std
        return self.root_std


from functools import partial

import jax


def _build_layers(mmcs, mats):
    """Device tree build: leaf sponge + compress ladder with mixed-height
    injection (merkle_tree.rs:95,141-170)."""
    heights = [m.shape[0] for m in mats]
    order = sorted(range(len(mats)), key=lambda i: -heights[i])
    max_h = max(heights)

    def take(h):
        return [mats[i] for i in order if heights[i] == h]

    layer = mmcs.sponge.hash_rows_device(take(max_h))  # (max_h, out)
    layers = [layer]
    h = max_h
    while h > 1:
        h //= 2
        pairs = layers[-1].reshape(h, 2, -1)
        layer = mmcs.compressor.compress_device(pairs[:, 0], pairs[:, 1])
        inject = take(h)
        if inject:
            tips = mmcs.sponge.hash_rows_device(inject)
            layer = mmcs.compressor.compress_device(layer, tips)
        layers.append(layer)
    return layers


_build_layers_jit = partial(jax.jit, static_argnums=0)(_build_layers)


@jax.jit
def _gather_many(arrays, idxs):
    """Fused multi-array gather returning ONE flat concatenation: a
    single dispatch AND a single device->host pull per proof (each
    separate output pull costs a full ~30 ms tunnel round-trip)."""
    return jnp.concatenate(
        [a[i].ravel() for a, i in zip(arrays, idxs)]
    )


def _gather_many_split(arrays, idxs):
    """Host wrapper: fused gather + one pull + split back to shapes."""
    flat = np.asarray(_gather_many(tuple(arrays), tuple(idxs)))
    out, off = [], 0
    for a, i in zip(arrays, idxs):
        w = int(np.prod(a.shape[1:], dtype=np.int64))
        cnt = int(i.shape[0]) * w
        out.append(flat[off : off + cnt].reshape((int(i.shape[0]),) + tuple(a.shape[1:])))
        off += cnt
    return out


class _Fut:
    """Resolved by PullBatcher.flush()."""

    __slots__ = ("value",)


class PullBatcher:
    """Share ONE device->host round-trip across several trees' pruned
    multi-openings (each separate pull costs ~30 ms of tunnel latency).

    usage: fut = batcher.add(mmcs, data, indices); batcher.flush();
    rows, proof = fut.value."""

    def __init__(self):
        self.entries = []

    def add(self, mmcs, data, indices):
        plan = mmcs._omb_plan(data, indices)
        fut = _Fut()
        self.entries.append((mmcs, data, plan, fut))
        return fut

    def flush(self):
        all_arrays, all_idx = [], []
        for _, _, plan, _ in self.entries:
            all_arrays.extend(plan["dev_arrays"])
            all_idx.extend(plan["dev_idx"])
        pulled = (
            _gather_many_split(all_arrays, all_idx) if all_arrays else []
        )
        off = 0
        for mmcs, data, plan, fut in self.entries:
            k = len(plan["dev_arrays"])
            fut.value = mmcs._omb_finish(
                data, plan, pulled[off : off + k]
            )
            off += k
        self.entries = []


def _build_layers_np(mmcs, mats):
    """Exact numpy tree build (host) — for small commits where a device
    compile would dominate (late FRI rounds)."""
    mats = [np.asarray(m) for m in mats]
    heights = [m.shape[0] for m in mats]
    order = sorted(range(len(mats)), key=lambda i: -heights[i])
    max_h = max(heights)

    def take(h):
        return [mats[i] for i in order if heights[i] == h]

    layer = mmcs.sponge.hash_rows_np(take(max_h))
    layers = [layer]
    h = max_h
    while h > 1:
        h //= 2
        pairs = layers[-1].reshape(h, 2, -1)
        layer = mmcs.compressor.compress_np(pairs[:, 0], pairs[:, 1])
        inject = take(h)
        if inject:
            tips = mmcs.sponge.hash_rows_np(inject)
            layer = mmcs.compressor.compress_np(layer, tips)
        layers.append(layer)
    return layers


@dataclass(frozen=True)
class MerkleTreeMmcs:
    sponge: PaddingFreeSponge
    compressor: TruncatedPermutation
    # Merkle cap height (mmcs/mod.rs:96): commitment = 2^cap_height
    # digests from cap_height levels below the root; 0 = root only. The
    # effective height clamps to the tree height (a 4-leaf tree under
    # cap_height 3 commits its whole leaf-digest layer — matches the
    # reference's behavior on small FRI round trees).
    cap_height: int = 0

    # dtype of standard-form wire values in proofs (u32 for the 31-bit
    # fields; the Goldilocks mmcs overrides with u64 — gl/merkle.py)
    wire_dtype = np.uint32

    def _eff_cap(self, log_max: int) -> int:
        return min(self.cap_height, log_max)

    @property
    def F(self):
        if self.sponge.perm is not None:
            return self.sponge.perm.F
        return self.sponge.F  # keccak-style sponges carry F directly

    def commit(self, mats, jit_tree: bool = True) -> MerkleProverData:
        """Commit to matrices (device uint32, rows already in final order).

        Heights must be powers of two. Matrices of the same height are
        hashed together (rows concatenated, in input order); shorter
        matrices are injected when the compression ladder reaches their
        height (merkle_tree.rs:141-170 semantics).

        jit_tree=False runs the ladder eagerly so each level reuses the
        shape-cached jitted permutation — right for the many small
        distinct-height FRI round commits (whole-tree programs would
        recompile per height).
        """
        F = self.F
        mats = list(mats)
        for m in mats:
            log2_strict(m.shape[0])
        if getattr(self.sponge, "host_only", False):
            mats = [np.asarray(m) for m in mats]
            jit_tree = "np"
        if jit_tree == "np":
            layers = _build_layers_np(self, mats)
        else:
            build = _build_layers_jit if jit_tree else _build_layers
            layers = build(self, mats)
        root_m = np.asarray(layers[-1][0])
        dif = getattr(self.sponge, "digest_is_field", True)
        root_std = tuple(
            int(x) for x in (F.from_monty_np(root_m) if dif else root_m)
        )
        log_max = log2_strict(max(m.shape[0] for m in mats))
        eff_cap = self._eff_cap(log_max)
        if eff_cap == 0:
            cap_std = (root_std,)
        else:
            assert min(m.shape[0] for m in mats) >= (1 << eff_cap), (
                "matrix shorter than the Merkle cap layer cannot be opened"
            )
            cap_m = np.asarray(layers[log_max - eff_cap])
            cap_conv = F.from_monty_np(cap_m) if dif else cap_m
            cap_std = tuple(
                tuple(int(x) for x in row) for row in cap_conv
            )
        return MerkleProverData(
            matrices=mats, layers=layers, root_std=root_std,
            digest_is_field=dif, cap_std=cap_std,
        )

    # ------------------------------------------------------------------
    def open_batch(self, data: MerkleProverData, index: int):
        """Open row `index >> (log_max_h - log_h)` of every matrix + path.

        Returns (opened_rows, proof): rows as lists of standard ints,
        proof as list of sibling digests (standard-int tuples), leaf to
        root. Index-shift semantics per `commit/src/mmcs.rs:88-94`.
        """
        F = self.F
        max_h = data.layers[0].shape[0]
        log_max = log2_strict(max_h)
        rows = []
        for m in data.matrices:
            shift = log_max - log2_strict(m.shape[0])
            r = F.from_monty_np(np.asarray(m[index >> shift]))
            rows.append([int(x) for x in r.reshape(-1)])
        host_layers = data.host_layers(F)
        proof = []
        idx = index
        for lvl in range(log_max - self._eff_cap(log_max)):
            sib = host_layers[lvl][idx ^ 1]
            proof.append(tuple(int(x) for x in sib))
            idx >>= 1
        return rows, proof

    def open_batch_many(self, data: MerkleProverData, indices,
                        want_proofs: bool = True):
        """Open many query indices at once: ONE device gather + transfer
        per matrix (vs per-row pulls in open_batch — the host/device
        round-trips dominated the FRI query phase otherwise).

        Returns (rows_per_query, proofs_per_query)."""
        F = self.F
        max_h = data.layers[0].shape[0]
        log_max = log2_strict(max_h)
        import jax.numpy as jnp

        per_mat_rows = []
        for m in data.matrices:
            shift = log_max - log2_strict(m.shape[0])
            idxs = np.array([i >> shift for i in indices], dtype=np.int32)
            if isinstance(m, np.ndarray):
                pulled = m[idxs]
            else:
                pulled = np.asarray(m[jnp.asarray(idxs)])
            per_mat_rows.append(F.from_monty_np(pulled))
        # sibling digests via per-level gathers: (Q,) rows per level pulled
        # in one transfer, instead of materializing whole layers on host
        dif = data.digest_is_field
        if not want_proofs:
            # bulk tolist: one C-level conversion per matrix instead of
            # Q*w python int() calls (hot in the FRI query phase)
            per_mat_lists = [
                r.reshape(len(indices), -1).tolist() for r in per_mat_rows
            ]
            rows_pq = [
                [per_mat_lists[k][q] for k in range(len(data.matrices))]
                for q in range(len(indices))
            ]
            return rows_pq, None
        sib_levels = []  # [level] -> (Q, digest_w) standard np
        idxs = np.array(indices, dtype=np.int64)
        for lvl in range(log_max - self._eff_cap(log_max)):
            layer = data.layers[lvl]
            want = (idxs ^ 1).astype(np.int32)
            if isinstance(layer, np.ndarray):
                sib = layer[want]
            else:
                sib = np.asarray(layer[jnp.asarray(want)])
            sib_levels.append(F.from_monty_np(sib) if dif else sib)
            idxs >>= 1
        rows_pq, proofs_pq = [], []
        for q, index in enumerate(indices):
            rows_pq.append(
                [
                    [int(x) for x in per_mat_rows[k][q].reshape(-1)]
                    for k in range(len(data.matrices))
                ]
            )
            proofs_pq.append(
                [
                    tuple(int(x) for x in sib_levels[lvl][q])
                    for lvl in range(log_max - self._eff_cap(log_max))
                ]
            )
        return rows_pq, proofs_pq

    def verify_batch_many(
        self, root_std, dims, indices, rows_pq, proofs_pq
    ) -> bool:
        """Verify many query openings at once with BATCHED numpy hashing
        (one keccak/poseidon2 call per tree level covering every query —
        the verifier analog of the reference's packed-SIMD path walk)."""
        Q = len(indices)
        heights = [d[0] for d in dims]
        max_h = max(heights)
        log_max = log2_strict(max_h)
        log_levels = log_max - self._eff_cap(log_max)
        if min(heights) < (1 << self._eff_cap(log_max)):
            return False
        order = sorted(range(len(dims)), key=lambda i: -heights[i])
        for rows in rows_pq:
            for i, d in enumerate(dims):
                if len(rows[i]) != d[1]:
                    return False
        for proof in proofs_pq:
            if len(proof) != log_levels:
                return False

        def rows_at_np(h):
            """(Q, total_w) standard-form concat of height-h matrices."""
            parts = [
                np.array([rows[i] for rows in rows_pq],
                         dtype=self.wire_dtype)
                for i in order
                if heights[i] == h
            ]
            return np.concatenate(parts, axis=1) if parts else None

        to_m = self.F.to_monty_np
        leaf = rows_at_np(max_h)
        digest = self.sponge.hash_rows_np([to_m(leaf)])
        dif = getattr(self.sponge, "digest_is_field", True)
        idx = np.array(indices, dtype=np.int64)
        h = max_h
        for lvl in range(log_levels):
            h //= 2
            sib = np.array(
                [proof[lvl] for proof in proofs_pq], dtype=self.wire_dtype
            )
            if dif:
                sib = to_m(sib)
            bit = (idx & 1).astype(bool)[:, None]
            left = np.where(bit, sib, digest)
            right = np.where(bit, digest, sib)
            digest = self.compressor.compress_np(left, right)
            idx >>= 1
            inj = rows_at_np(h)
            if inj is not None:
                tips = self.sponge.hash_rows_np([to_m(inj)])
                digest = self.compressor.compress_np(digest, tips)
        if dif:
            digest = self.F.from_monty_np(digest)
        if self._eff_cap(log_max) == 0:
            want = np.array(root_std, dtype=self.wire_dtype)
            return bool((digest == want[None, :]).all())
        # cap comparison: each query's digest must equal its cap entry
        cap = np.array(root_std, dtype=self.wire_dtype)  # (2^cap, dw)
        if cap.ndim != 2 or cap.shape[0] != (1 << self._eff_cap(log_max)):
            return False
        return bool((digest == cap[idx]).all())

    def verify_batch(
        self, root_std, dims, index: int, rows, proof
    ) -> bool:
        """Exact host verification. dims: list of (height, width)."""
        heights = [d[0] for d in dims]
        max_h = max(heights)
        log_max = log2_strict(max_h)
        log_levels = log_max - self._eff_cap(log_max)
        if len(proof) != log_levels or min(heights) < (1 << self._eff_cap(log_max)):
            return False
        order = sorted(range(len(dims)), key=lambda i: -heights[i])

        for i, d in enumerate(dims):  # width binding (commit/src/mmcs.rs:145)
            if len(rows[i]) != d[1]:
                return False

        def rows_at(h):
            out = []
            for i in order:
                if heights[i] == h:
                    out.extend(rows[i])
            return out

        digest = self.sponge.hash_iter_host(rows_at(max_h))
        idx = index
        h = max_h
        for sib in proof:
            h //= 2
            if idx & 1:
                digest = self.compressor.compress_host(sib, digest)
            else:
                digest = self.compressor.compress_host(digest, sib)
            idx >>= 1
            inj = rows_at(h)
            if inj:
                tips = self.sponge.hash_iter_host(inj)
                digest = self.compressor.compress_host(digest, tips)
        if self._eff_cap(log_max) == 0:
            return tuple(digest) == tuple(root_std)
        if len(root_std) != (1 << self._eff_cap(log_max)):
            return False
        return tuple(digest) == tuple(root_std[idx])

    # ------------------------------------------------------------------
    # Pruned multi-openings (merkle-tree/src/pruning.rs frontier walk +
    # mmcs/batch.rs open_multi_batch:275 / verify_multi_batch:286):
    # opening k indices shares one proof; a sibling digest is shipped only
    # when no queried leaf lies under it. Wire order is normative:
    # level 0 first; within a level, groups by ascending parent index;
    # within a group, missing child positions ascending.
    # ------------------------------------------------------------------
    def open_multi_batch(self, data: MerkleProverData, indices):
        """Open many indices with ONE pruned proof.

        Returns (rows_per_query, sibling_hashes): rows as in
        open_batch_many; sibling_hashes a flat list of standard-form
        digest tuples in frontier order.

        TPU shape: all device pulls fuse into one gather + ONE
        device->host round-trip; use a PullBatcher to share that
        round-trip across several trees of one proof."""
        plan = self._omb_plan(data, indices)
        pulled = (
            _gather_many_split(plan["dev_arrays"], plan["dev_idx"])
            if plan["dev_arrays"]
            else []
        )
        return self._omb_finish(data, plan, pulled)

    def _omb_plan(self, data: MerkleProverData, indices):
        """Phase 1: frontier walk + device gather assembly (no pulls)."""
        max_h = data.layers[0].shape[0]
        log_max = log2_strict(max_h)
        Q = len(indices)

        # boundary node positions per level (host walk, tiny); the walk
        # stops at the cap layer — nodes there are in the commitment
        frontier = sorted(set(int(i) for i in indices))
        want = []  # (level, node) in wire order
        by_level = {}
        for lvl in range(log_max - self._eff_cap(log_max)):
            present = set(frontier)
            for node in frontier:
                if node ^ 1 not in present:
                    want.append((lvl, node ^ 1))
                    by_level.setdefault(lvl, []).append(node ^ 1)
            frontier = sorted({node >> 1 for node in frontier})

        dev_arrays, dev_idx, dev_tags = [], [], []
        np_rows, np_levels = {}, {}
        for k, m in enumerate(data.matrices):
            shift = log_max - log2_strict(m.shape[0])
            idxs = np.array([i >> shift for i in indices], dtype=np.int32)
            if isinstance(m, np.ndarray):
                np_rows[k] = m[idxs]
            else:
                dev_arrays.append(m)
                dev_idx.append(jnp.asarray(idxs))
                dev_tags.append(("mat", k))
        for lvl, nodes in by_level.items():
            layer = data.layers[lvl]
            padded = np.zeros(Q, dtype=np.int32)
            padded[: len(nodes)] = nodes
            if isinstance(layer, np.ndarray):
                np_levels[lvl] = layer[padded[: len(nodes)]]
            else:
                dev_arrays.append(layer)
                dev_idx.append(jnp.asarray(padded))
                dev_tags.append(("lvl", lvl))
        return dict(
            dev_arrays=dev_arrays, dev_idx=dev_idx, dev_tags=dev_tags,
            np_rows=np_rows, np_levels=np_levels, by_level=by_level,
            want=want, Q=Q, indices=list(indices),
        )

    def _omb_finish(self, data: MerkleProverData, plan, pulled):
        """Phase 2: convert pulled arrays to wire-form rows + proof."""
        F = self.F
        dif = data.digest_is_field
        Q = plan["Q"]
        by_level = plan["by_level"]
        mat_rows, lvl_digs = dict(plan["np_rows"]), {}
        for lvl, d in plan["np_levels"].items():
            lvl_digs[lvl] = d
        for (kind, key), arr in zip(plan["dev_tags"], pulled):
            if kind == "mat":
                mat_rows[key] = arr
            else:
                lvl_digs[key] = arr[: len(by_level[key])]

        mat_lists = [
            F.from_monty_np(mat_rows[k]).reshape(Q, -1).tolist()
            for k in range(len(data.matrices))
        ]
        rows_pq = [
            [mat_lists[k][q] for k in range(len(data.matrices))]
            for q in range(Q)
        ]
        pulled_map = {}
        for lvl, nodes in by_level.items():
            digs = lvl_digs[lvl]
            if dif:
                digs = F.from_monty_np(digs)
            for n, d in zip(nodes, digs):
                pulled_map[(lvl, n)] = tuple(int(x) for x in d)
        sibling_hashes = [
            pulled_map[(lvl, node)] for lvl, node in plan["want"]
        ]
        return rows_pq, sibling_hashes

    def verify_multi_batch(
        self, root_std, dims, indices, rows_pq, sibling_hashes
    ) -> bool:
        """Verify a pruned multi-opening (verify_multi_batch semantics).

        All hashing is batched per level across the frontier. Duplicate
        queries must supply identical rows. Consumes sibling_hashes
        exactly (trailing digests are rejected)."""
        Q = len(indices)
        if len(rows_pq) != Q:
            return False
        heights = [d[0] for d in dims]
        max_h = max(heights)
        log_max = log2_strict(max_h)
        order = sorted(range(len(dims)), key=lambda i: -heights[i])
        for rows in rows_pq:
            if len(rows) != len(dims):
                return False
            for i, d in enumerate(dims):
                if len(rows[i]) != d[1]:
                    return False

        to_m = self.F.to_monty_np
        dif = getattr(self.sponge, "digest_is_field", True)

        def tips_for(h, leads):
            """Hash the height-h matrices' rows for the lead queries."""
            parts = [
                np.array([rows_pq[q][i] for q in leads],
                         dtype=self.wire_dtype)
                for i in order
                if heights[i] == h
            ]
            if not parts:
                return None
            return self.sponge.hash_rows_np([to_m(np.concatenate(parts, axis=1))])

        # frontier: node -> (digest ndarray, lead query)
        lead_for = {}
        for q, idx in enumerate(indices):
            node = int(idx)
            if node not in lead_for:
                lead_for[node] = q
            else:
                # duplicate index: rows must agree
                if rows_pq[q] != rows_pq[lead_for[node]]:
                    return False
        nodes = sorted(lead_for)
        leads = [lead_for[n] for n in nodes]
        digests = tips_for(max_h, leads)  # (n_nodes, dw) monty/raw

        sib_iter = iter(sibling_hashes)
        consumed = 0
        h = max_h
        log_levels = log_max - self._eff_cap(log_max)
        if min(heights) < (1 << self._eff_cap(log_max)):
            return False
        for lvl in range(log_levels):
            h //= 2
            node_set = set(nodes)
            left_rows, right_rows = [], []
            parents = []
            try:
                pos = {n: i for i, n in enumerate(nodes)}
                for n in nodes:
                    if n & 1:
                        if (n ^ 1) in node_set:
                            continue  # handled by the even sibling
                        sib = np.asarray(next(sib_iter),
                                         dtype=self.wire_dtype)
                        consumed += 1
                        left_rows.append(to_m(sib) if dif else sib)
                        right_rows.append(digests[pos[n]])
                        parents.append(n >> 1)
                    else:
                        left_rows.append(digests[pos[n]])
                        if (n ^ 1) in node_set:
                            right_rows.append(digests[pos[n ^ 1]])
                        else:
                            sib = np.asarray(next(sib_iter),
                                             dtype=self.wire_dtype)
                            consumed += 1
                            right_rows.append(to_m(sib) if dif else sib)
                        parents.append(n >> 1)
            except StopIteration:
                return False
            digests = self.compressor.compress_np(
                np.stack(left_rows), np.stack(right_rows)
            )
            new_lead = {}
            for n in nodes:
                p = n >> 1
                if p not in new_lead:
                    new_lead[p] = lead_for[n]
            nodes = sorted(new_lead)
            lead_for = new_lead
            leads = [lead_for[n] for n in nodes]
            tips = tips_for(h, leads)
            if tips is not None:
                digests = self.compressor.compress_np(digests, tips)
        if consumed != len(sibling_hashes):
            return False
        if dif:
            digests = self.F.from_monty_np(digests)
        if self._eff_cap(log_max) == 0:
            want = np.array(root_std, dtype=self.wire_dtype)
            return bool((digests[0] == want).all())
        # several frontier nodes may survive at the cap layer; each must
        # equal its committed cap entry
        cap = np.array(root_std, dtype=self.wire_dtype)
        if cap.ndim != 2 or cap.shape[0] != (1 << self._eff_cap(log_max)):
            return False
        pos = {n: i for i, n in enumerate(nodes)}
        return all(
            bool((digests[pos[n]] == cap[n]).all()) for n in nodes
        )
