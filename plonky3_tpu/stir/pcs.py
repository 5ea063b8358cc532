"""TwoAdicStirPcs — the univariate PCS over STIR (stir/src/pcs.rs).

Commit: coset-LDE each matrix onto gK in bit-reversed row order, then
reshape into fiber-grouped form (each committed row holds the
2^log_folding_factor LDE rows one first-round STIR query reads —
a pure reshape, pcs.rs:90-98) and commit with the base-field MMCS.

Open: barycentric column evals + alpha-batched reduced openings per LDE
height (the same _ys/_mred/_accum device kernels as TwoAdicFriPcs),
then per height bucket run STIR on the reduced opening as an EXTERNAL
codeword (never re-committed: the transcript already pins it through
the input commitments, claimed values, and alpha), and open the input
matrices at STIR's first-round query fibers (pcs.rs:291-470).

Verify: replay the alpha batching from claimed values; each bucket's
initial fibers are rebuilt from the input MMCS openings inside a
closure handed to verify_stir_with_external_initial (pcs.rs:476-735).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..commit.domain import TwoAdicCoset
from ..fri.two_adic_pcs import (
    _inv_denom_kernel,
    _mred,
    _ys_kernel,
)
from ..ops.ntt import coset_lde_batch, powers_device
from ..utils.bits import (
    bitrev_permute_axis0,
    log2_strict,
    reverse_bits_len,
)
from .config import StirConfig, StirParameters
from .prover import prove_stir_from_external_codeword
from .verifier import (
    InvalidProofShape,
    StirError,
    verify_stir_with_external_initial,
)


@dataclass
class StirProverData:
    """Committed fiber-grouped LDEs + the ungrouped views (pcs.rs:76)."""

    data: object  # MerkleProverData over grouped matrices
    ldes: list  # ungrouped bit-reversed (h, w) LDE device arrays
    domains: list
    root_std: tuple = None

    @property
    def matrices(self):
        return self.ldes


@dataclass
class BucketProof:
    stir_proof: object
    input_openings: list  # per commitment: (rows_pq, pruned) or None


@partial(jax.jit, static_argnames=("E",))
def _accum_stir_kernel(E, acc, mred_z_m, mat_compressed, inv_denom,
                       alpha_off_m):
    """acc += alpha_off · (Mred(x) - Mred(z)) / (z - x) — the reference
    STIR orientation (pcs.rs:395: (p_x - y_combined) * inv_denom)."""
    h = mat_compressed.shape[0]
    diff = E.sub(mat_compressed, jnp.broadcast_to(mred_z_m, (h, E.D)))
    return E.add(acc, E.mul(E.mul(diff, inv_denom), alpha_off_m))


@dataclass(frozen=True)
class TwoAdicStirPcs:
    F: object
    E: object
    params: StirParameters
    mmcs: object  # base-field MerkleTreeMmcs (input commitments)
    stir_mmcs: object  # ExtensionMmcs (STIR round commitments)

    ZK = False

    # ------------------------------------------------------------------
    def natural_domain_for_degree(self, degree: int) -> TwoAdicCoset:
        return TwoAdicCoset(self.F, 1, log2_strict(degree))

    def _stir_config(self, log_h):
        log_deg = max(log_h - self.params.log_blowup, 1)
        return StirConfig.new(
            self.F, self.E, self.stir_mmcs, log_deg, self.params
        )

    def commit(self, evaluations):
        F = self.F
        arity = 1 << self.params.log_folding_factor
        ldes, grouped, domains = [], [], []
        for domain, evals in evaluations:
            assert evals.shape[0] == domain.size
            assert evals.shape[0] >= arity, (
                "STIR PCS: matrix height below 2^log_folding_factor"
            )
            shift = F.mul_h(F.GENERATOR, F.inv_h(domain.shift))
            lde = coset_lde_batch(
                F, evals, self.params.log_blowup, shift
            )  # bit-reversed rows
            h, w = lde.shape
            ldes.append(lde)
            grouped.append(lde.reshape(h // arity, w * arity))
            domains.append(domain)
        data = self.mmcs.commit(grouped)
        pd = StirProverData(
            data=data, ldes=ldes, domains=domains, root_std=data.root_std
        )
        return pd

    def get_evaluations_on_domain(self, pd, mat_index, domain):
        lde = pd.ldes[mat_index]
        log_lde = log2_strict(lde.shape[0])
        committed = TwoAdicCoset(self.F, self.F.GENERATOR, log_lde)
        assert domain.shift == committed.shift, "domain must share shift gK"
        prefix = lde[: domain.size]
        return bitrev_permute_axis0(prefix, domain.log_n)

    # ------------------------------------------------------------------
    def open(self, data_with_points, challenger, spans=None):
        F, E = self.F, self.E
        lff = self.params.log_folding_factor
        arity = 1 << lff

        all_mats = [
            (rnd, i, mat)
            for rnd, (pd, _) in enumerate(data_with_points)
            for i, mat in enumerate(pd.ldes)
        ]
        log_gmax = max(log2_strict(m.shape[0]) for _, _, m in all_mats)

        xs_br = bitrev_permute_axis0(
            powers_device(
                F, F.two_adic_generator_h(log_gmax), 1 << log_gmax,
                scale_std=F.GENERATOR,
            ),
            log_gmax,
        )

        max_h_for_point = {}
        for pd, points in data_with_points:
            for mat, pts in zip(pd.ldes, points):
                for z in pts:
                    max_h_for_point[z] = max(
                        max_h_for_point.get(z, 0), mat.shape[0]
                    )
        inv_denoms = {}
        for z, h in max_h_for_point.items():
            zc = jnp.asarray(E.to_monty_np(z))
            inv_denoms[z] = _inv_denom_kernel(E, zc, xs_br[:h])

        # barycentric ys + observe (same math as TwoAdicFriPcs.open)
        opened_values = []
        for pd, points in data_with_points:
            round_vals = []
            for mat, pts in zip(pd.ldes, points):
                h = mat.shape[0]
                mat_vals = []
                for z in pts:
                    s_pow_n = F.exp_h(F.GENERATOR, h)
                    zn = E.exp_h(z, h)
                    factor = E.base_mul_h(
                        F.inv_h(F.mul_h(h, s_pow_n)),
                        E.sub_h(zn, E.from_base_h(s_pow_n)),
                    )
                    ys_dev = _ys_kernel(
                        E, mat, xs_br[:h], inv_denoms[z][:h],
                        jnp.asarray(E.to_monty_np(factor)),
                    )
                    ys_np = F.from_monty_np(np.asarray(ys_dev))
                    ys = [tuple(int(c) for c in row) for row in ys_np]
                    for y in ys:
                        challenger.observe_ext(y)
                    mat_vals.append(ys)
                round_vals.append(mat_vals)
            opened_values.append(round_vals)

        alpha = challenger.sample_ext(E.D)

        # alpha-batched reduced openings per height bucket
        reduced, num_reduced = {}, {}
        for (pd, points), round_vals in zip(data_with_points, opened_values):
            for mat, pts, mat_vals in zip(pd.ldes, points, round_vals):
                h, w = mat.shape
                log_h = log2_strict(h)
                alpha_pows = E.powers_np(alpha, w)
                mat_compressed = _mred(E, mat, jnp.asarray(alpha_pows))
                for z, ys in zip(pts, mat_vals):
                    acc = reduced.setdefault(
                        log_h, jnp.zeros((h, E.D), jnp.uint32)
                    )
                    nr = num_reduced.get(log_h, 0)
                    mred_z = E.zero_h()
                    ap = E.one_h()
                    for y in ys:
                        mred_z = E.add_h(mred_z, E.mul_h(ap, y))
                        ap = E.mul_h(ap, alpha)
                    alpha_off = E.exp_h(alpha, nr)
                    reduced[log_h] = _accum_stir_kernel(
                        E, acc, jnp.asarray(E.to_monty_np(mred_z)),
                        mat_compressed, inv_denoms[z][:h],
                        jnp.asarray(E.to_monty_np(alpha_off)),
                    )
                    num_reduced[log_h] = nr + w

        # per height bucket (descending): STIR + input binding
        bucket_proofs = []
        for log_h in sorted(reduced.keys(), reverse=True):
            ro_br = np.asarray(reduced[log_h])
            ro_natural = np.asarray(
                bitrev_permute_axis0(ro_br, log_h)
            )
            cfg = self._stir_config(log_h)
            stir_proof, first_js = prove_stir_from_external_codeword(
                cfg, ro_natural, challenger
            )

            input_openings = []
            for pd, _ in data_with_points:
                heights = [m.shape[0] for m in pd.ldes]
                if (1 << log_h) not in heights:
                    input_openings.append(None)
                    continue
                log_commit_max = log2_strict(max(heights))
                q_globals = [
                    reverse_bits_len(j, log_h - lff)
                    << (log_commit_max - log_h)
                    for j in first_js
                ]
                rows_pq, pruned = self.mmcs.open_multi_batch(
                    pd.data, q_globals
                )
                input_openings.append((rows_pq, pruned))
            bucket_proofs.append(
                BucketProof(
                    stir_proof=stir_proof, input_openings=input_openings
                )
            )
        return opened_values, bucket_proofs

    # ------------------------------------------------------------------
    def verify(self, commitments_with_opening_points, proof, challenger):
        F, E = self.F, self.E
        lff = self.params.log_folding_factor
        arity = 1 << lff
        lb = self.params.log_blowup

        for _, mats in commitments_with_opening_points:
            for _, points_and_values in mats:
                for _, ys in points_and_values:
                    for y in ys:
                        challenger.observe_ext(y)
        alpha = challenger.sample_ext(E.D)

        bucket_log_heights = sorted(
            {
                domain.log_n + lb
                for _, mats in commitments_with_opening_points
                for domain, _ in mats
            },
            reverse=True,
        )
        if len(proof) != len(bucket_log_heights):
            raise InvalidProofShape()

        # alpha_pow_offset per (commit, mat, point), in prover order
        height_num_reduced = {}
        alpha_offsets = []
        widths = []
        for _, mats in commitments_with_opening_points:
            per_commit, w_commit = [], []
            for domain, point_claims in mats:
                log_h = domain.log_n + lb
                per_mat = []
                for _, vals in point_claims:
                    nr = height_num_reduced.get(log_h, 0)
                    per_mat.append(E.exp_h(alpha, nr))
                    height_num_reduced[log_h] = nr + len(vals)
                per_commit.append(per_mat)
                w_commit.append(
                    point_claims[0][1].__len__() if point_claims else 0
                )
            alpha_offsets.append(per_commit)
            widths.append(w_commit)

        for bucket_idx, log_h in enumerate(bucket_log_heights):
            bucket_height = 1 << log_h
            bp = proof[bucket_idx]
            if len(bp.input_openings) != len(
                commitments_with_opening_points
            ):
                raise InvalidProofShape()
            cfg = self._stir_config(log_h)
            domain_gen = F.two_adic_generator_h(log_h)
            fiber_step = F.exp_h(domain_gen, 1 << (log_h - lff))

            def reconstruct(query_indices, _log_h=log_h, _bp=bp,
                            _gen=domain_gen, _step=fiber_step):
                unique_js = sorted(set(query_indices))
                n_q = len(unique_js)
                expected = [
                    [E.zero_h() for _ in range(arity)] for _ in range(n_q)
                ]
                for commit_idx, (
                    (root, mats), opening
                ) in enumerate(
                    zip(commitments_with_opening_points,
                        _bp.input_openings)
                ):
                    lde_heights = [
                        1 << (domain.log_n + lb) for domain, _ in mats
                    ]
                    has = (1 << _log_h) in lde_heights
                    if opening is None:
                        if has:
                            raise InvalidProofShape()
                        continue
                    if not has:
                        raise InvalidProofShape()
                    rows_pq, pruned = opening
                    commit_max = max(lde_heights)
                    log_commit_max = log2_strict(commit_max)
                    mat_widths = [
                        mats[i][1][0][1].__len__() if mats[i][1] else 0
                        for i in range(len(mats))
                    ]
                    dims = [
                        (h >> lff, w * arity)
                        for h, w in zip(lde_heights, mat_widths)
                    ]
                    q_globals = [
                        reverse_bits_len(j, _log_h - lff)
                        << (log_commit_max - _log_h)
                        for j in unique_js
                    ]
                    if len(rows_pq) != len(q_globals):
                        raise InvalidProofShape()
                    if not self.mmcs.verify_multi_batch(
                        root, dims, q_globals, rows_pq, list(pruned)
                    ):
                        raise StirError("input opening rejected")
                    for q_idx, j in enumerate(unique_js):
                        row_by_mat = rows_pq[q_idx]
                        fiber_point = F.mul_h(
                            F.GENERATOR, F.exp_h(_gen, j)
                        )
                        for l in range(arity):
                            slot = reverse_bits_len(l, lff)
                            for mat_idx, (domain, point_claims) in (
                                enumerate(mats)
                            ):
                                if lde_heights[mat_idx] != (1 << _log_h):
                                    continue
                                w = mat_widths[mat_idx]
                                row = row_by_mat[mat_idx][
                                    slot * w : (slot + 1) * w
                                ]
                                p_x = E.zero_h()
                                ap = E.one_h()
                                for v in row:
                                    p_x = E.add_h(
                                        p_x, E.base_mul_h(int(v), ap)
                                    )
                                    ap = E.mul_h(ap, alpha)
                                for point_idx, (z, vals) in enumerate(
                                    point_claims
                                ):
                                    off = alpha_offsets[commit_idx][
                                        mat_idx][point_idx]
                                    y_comb = E.zero_h()
                                    ap2 = E.one_h()
                                    for y in vals:
                                        y_comb = E.add_h(
                                            y_comb, E.mul_h(y, ap2)
                                        )
                                        ap2 = E.mul_h(ap2, alpha)
                                    inv_d = E.inv_h(
                                        E.sub_h(
                                            z,
                                            E.from_base_h(fiber_point),
                                        )
                                    )
                                    expected[q_idx][l] = E.add_h(
                                        expected[q_idx][l],
                                        E.mul_h(
                                            E.mul_h(
                                                off,
                                                E.sub_h(p_x, y_comb),
                                            ),
                                            inv_d,
                                        ),
                                    )
                            fiber_point = F.mul_h(fiber_point, _step)
                # expand back to draw order (dups share the fiber)
                by_j = dict(zip(unique_js, expected))
                return [list(by_j[j]) for j in query_indices]

            verify_stir_with_external_initial(
                cfg, bp.stir_proof, challenger, reconstruct
            )
