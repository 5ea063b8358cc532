"""FRI verifier — exact host arithmetic, typed error taxonomy.

Protocol parity with `fri/src/verifier.rs:158` (verify_fri): sample alpha;
per round observe commit / check commit-PoW / sample beta; check final-poly
length; observe final poly; observe arity schedule; check query PoW; sample
indices; per query verify input openings, walk the fold chain
(`fold_query` :490), roll in reduced openings at matching heights scaled by
beta^arity, and check the final fold against the final polynomial evaluated
at x = g^{rev(index)}; finally authenticate every round's opened rows.

fold_row (two_adic_pcs.rs:109-131): Lagrange-interpolate the sibling group
at beta over the points {s·w^j} bitrev-ordered, s = g_{h·a}^{rev(parent)}.
"""

from __future__ import annotations

from ..utils.bits import reverse_bits_len
from .config import FriParameters
from .proof import FriProof


class FriError(Exception):
    """Verification failure (message mirrors the reference error enum,
    fri/src/verifier.rs:21)."""


def _lagrange_interpolate_at(E, xs_base, ys_ext, z_ext):
    """Interpolate (xs, ys) at z (two_adic_pcs.rs lagrange_interpolate_at).

    xs are base ints forming a bitrev-ordered coset; ys/z ext tuples.
    """
    F = E.base
    n = len(xs_base)
    for x, y in zip(xs_base, ys_ext):
        if z_ext == E.from_base_h(x):
            return y
    log_n = n.bit_length() - 1
    coset_power = F.exp_h(xs_base[0], n)
    weight_scale = F.inv_h(F.mul_h(n, coset_power))
    diffs = [E.sub_h(z_ext, E.from_base_h(x)) for x in xs_base]
    l_z = E.one_h()
    for d in diffs:
        l_z = E.mul_h(l_z, d)
    acc = E.zero_h()
    for x, y, d in zip(xs_base, ys_ext, diffs):
        w = F.mul_h(x, weight_scale)
        term = E.mul_h(E.base_mul_h(w, y), E.inv_h(d))
        acc = E.add_h(acc, term)
    return E.mul_h(acc, l_z)


def fold_row_host(E, index, log_height, log_arity, beta, evals):
    """Fold one sibling group (two_adic_pcs.rs fold_row)."""
    F = E.base
    arity = 1 << log_arity
    assert len(evals) == arity
    start = F.exp_h(
        F.two_adic_generator_h(log_height + log_arity),
        reverse_bits_len(index, log_height),
    )
    w = F.two_adic_generator_h(log_arity)
    xs = []
    x = start
    for _ in range(arity):
        xs.append(x)
        x = F.mul_h(x, w)
    # bit-reverse xs to match the committed (bitrev) group order
    xs = [xs[reverse_bits_len(j, log_arity)] for j in range(arity)]
    return _lagrange_interpolate_at(E, xs, evals, beta)


class TwoAdicRowFolding:
    """Verifier-side default folding (two_adic_pcs.rs fold_row)."""

    extra_query_index_bits = 0
    observe_arity_schedule = True
    scale_roll_in = True

    def fold_row(self, E, index, log_folded, log_arity, beta, group):
        return fold_row_host(E, index, log_folded, log_arity, beta, group)


def verify_fri(
    E,
    params: FriParameters,
    proof: FriProof,
    challenger,
    # [(commit_root, [(domain, [(z, ys)])] )] — mirrors
    # CommitmentWithOpeningPoints; domain is a TwoAdicCoset.
    commitments_with_opening_points,
    input_mmcs,
    fri_mmcs,
    folding=None,  # verifier folding strategy; default two-adic
    open_inputs_fn=None,  # (indices) -> per-query [(log_h, ext)] lists
    alpha=None,  # pre-sampled batching challenge (circle); None = sample
    check_global_height=True,
):
    F = E.base
    if folding is None:
        folding = TwoAdicRowFolding()
    if params.num_queries == 0:
        raise FriError("ZeroQueries")

    if alpha is None:
        alpha = challenger.sample_ext(E.D)

    rounds = len(proof.commit_phase_commits)
    if len(proof.commit_phase_steps) != rounds:
        raise FriError("CommitPhaseOpeningsCountMismatch")
    log_arities = []
    for r, step in enumerate(proof.commit_phase_steps):
        if not (1 <= step.log_arity <= params.max_log_arity):
            raise FriError(f"InvalidLogArity round {r}")
        log_arities.append(step.log_arity)
        if len(step.sibling_values) != params.num_queries:
            raise FriError(f"CommitPhaseQueryCountMismatch round {r}")
        for sib in step.sibling_values:
            if len(sib) != (1 << step.log_arity) - 1:
                raise FriError(f"SiblingValuesLengthMismatch round {r}")

    total_log_reduction = sum(log_arities)
    log_global_max_height = (
        total_log_reduction + params.log_blowup + params.log_final_poly_len
    )
    if check_global_height and log_global_max_height > F.TWO_ADICITY:
        # (two-adic only: the circle group's height bound is checked by
        # CirclePcs.verify against CIRCLE_TWO_ADICITY instead)
        raise FriError("GlobalMaxHeightTooLarge")
    committed_heights = [
        dom.log_n + params.log_blowup
        for (_, mats) in (commitments_with_opening_points or [])
        for (dom, _) in mats
    ]
    if (
        check_global_height
        and committed_heights
        and max(committed_heights) != log_global_max_height
    ):
        raise FriError("GlobalMaxHeightMismatch")

    if len(proof.commit_pow_witnesses) != rounds:
        raise FriError("CommitPowWitnessCountMismatch")

    betas = []
    for commit, witness in zip(
        proof.commit_phase_commits, proof.commit_pow_witnesses
    ):
        challenger.observe_digest(commit)
        if not challenger.check_witness(
            params.commit_proof_of_work_bits, witness
        ):
            raise FriError("InvalidPowWitness (commit)")
        betas.append(challenger.sample_ext(E.D))

    if len(proof.final_poly) != params.final_poly_len:
        raise FriError("FinalPolyLengthMismatch")
    for coeff in proof.final_poly:
        challenger.observe_ext(coeff)
    if getattr(folding, "observe_arity_schedule", True):
        for la in log_arities:
            challenger.observe(la)
    if not challenger.check_witness(
        params.query_proof_of_work_bits, proof.query_pow_witness
    ):
        raise FriError("InvalidPowWitness (query)")

    log_final_height = params.log_blowup + params.log_final_poly_len

    extra = folding.extra_query_index_bits
    indices = [
        challenger.sample_bits(log_global_max_height + extra)
        for _ in range(params.num_queries)
    ]

    if open_inputs_fn is not None:
        reduced_openings = open_inputs_fn(indices)
    else:
        reduced_openings = _open_inputs(
            E,
            params,
            log_global_max_height,
            indices,
            proof.input_openings,
            alpha,
            input_mmcs,
            commitments_with_opening_points,
        )

    # fold chains; per-round opened groups collected for ONE batched
    # Merkle authentication per round (vs per-query path walks)
    round_groups = [[] for _ in range(rounds)]
    round_indices = [[] for _ in range(rounds)]
    for query, (index, ro) in enumerate(zip(indices, reduced_openings)):
        if not ro or ro[0][0] != log_global_max_height:
            raise FriError("InitialReducedOpeningHeightMismatch")
        ro_iter = list(ro)
        folded_eval = ro_iter.pop(0)[1]
        domain_index = index >> extra
        log_current = log_global_max_height
        for r, (beta, log_arity, step) in enumerate(
            zip(betas, log_arities, proof.commit_phase_steps)
        ):
            arity = 1 << log_arity
            pos = domain_index % arity
            group = []
            sib_it = iter(step.sibling_values[query])
            for j in range(arity):
                group.append(folded_eval if j == pos else next(sib_it))
            log_folded = log_current - log_arity
            domain_index >>= log_arity
            folded_eval = folding.fold_row(
                E, domain_index, log_folded, log_arity, beta, group
            )
            round_groups[r].append(
                [[c for v in group for c in v]]
            )
            round_indices[r].append(domain_index)
            log_current = log_folded
            if ro_iter and ro_iter[0][0] == log_folded:
                if getattr(folding, "scale_roll_in", True):
                    beta_pow = beta
                    for _ in range(log_arity):
                        beta_pow = E.mul_h(beta_pow, beta_pow)
                    folded_eval = E.add_h(
                        folded_eval, E.mul_h(beta_pow, ro_iter.pop(0)[1])
                    )
                else:
                    folded_eval = E.add_h(folded_eval, ro_iter.pop(0)[1])
        if log_current != log_final_height:
            raise FriError("FinalFoldHeightMismatch")
        if ro_iter:
            raise FriError("UnconsumedReducedOpenings")

        if len(proof.final_poly) == 1:
            # constant final poly: no evaluation point needed (also the
            # only case for circle FRI, which has no two-adic generator)
            eval_fp = proof.final_poly[0]
        else:
            x = F.exp_h(
                F.two_adic_generator_h(log_final_height),
                reverse_bits_len(domain_index, log_final_height),
            )
            # Horner
            eval_fp = E.zero_h()
            for coeff in reversed(proof.final_poly):
                eval_fp = E.add_h(E.base_mul_h(x, eval_fp), coeff)
        if eval_fp != folded_eval:
            raise FriError("FinalPolyMismatch")

    # batched commit-phase authentication (one pass per round)
    log_current = log_global_max_height
    for r, (log_arity, step) in enumerate(
        zip(log_arities, proof.commit_phase_steps)
    ):
        arity = 1 << log_arity
        log_folded = log_current - log_arity
        ok = fri_mmcs.inner.verify_multi_batch(
            proof.commit_phase_commits[r],
            [(1 << log_folded, arity * E.D)],
            round_indices[r],
            round_groups[r],
            step.opening_proof,
        )
        if not ok:
            raise FriError(f"CommitPhaseMmcsError round {r}")
        log_current = log_folded


def _open_inputs(
    E,
    params,
    log_global_max_height,
    indices,
    input_openings,
    alpha,
    input_mmcs,
    commitments_with_opening_points,
):
    """Authenticate input openings and build per-query reduced openings
    (verifier.rs open_inputs:617) — batched across queries: one
    vectorized Merkle check per commitment and one numpy Mred per
    matrix, instead of per-query python loops over every column."""
    import numpy as np

    F = E.base
    Q = len(indices)
    if len(input_openings) != len(commitments_with_opening_points):
        raise FriError("InputProofBatchCountMismatch")

    # authenticate (all queries at once per commitment)
    for batch, (opening, (commit, mats)) in enumerate(
        zip(input_openings, commitments_with_opening_points)
    ):
        if len(opening.opened_values) != Q:
            raise FriError(f"InputOpeningsQueryCountMismatch batch {batch}")
        for q in range(Q):
            if len(opening.opened_values[q]) != len(mats):
                raise FriError(
                    f"BatchOpenedValuesCountMismatch batch {batch}"
                )
        heights = [dom.size << params.log_blowup for (dom, _) in mats]
        dims = []
        for m, (dom, points_and_values) in enumerate(mats):
            if not points_and_values:
                raise FriError(f"MatrixWithoutOpeningPoints {batch},{m}")
            width = len(points_and_values[0][1])
            dims.append((heights[m], width))
        bits_reduced = log_global_max_height - max(heights).bit_length() + 1
        ok = input_mmcs.verify_multi_batch(
            commit,
            dims,
            [index >> bits_reduced for index in indices],
            opening.opened_values,
            opening.opening_proof,
        )
        if not ok:
            raise FriError(f"InputError batch {batch}")

    # reduce: per-height alpha offsets advance identically for every query
    # (two_adic_pcs.rs:601-655), so Mred vectorizes over queries.
    max_k = 0
    for opening, (commit, mats) in zip(
        input_openings, commitments_with_opening_points
    ):
        for dom, points_and_values in mats:
            max_k += len(points_and_values) * len(
                points_and_values[0][1]
            )
    # standard-form host powers (E.powers_np returns the device wire
    # form, Monty for BinomialExtension — not usable for host math)
    alpha_pows = [E.one_h()]
    for _ in range(max(max_k, 1) - 1):
        alpha_pows.append(E.mul_h(alpha_pows[-1], alpha))

    accs = [dict() for _ in range(Q)]  # log_height -> ext value
    offsets = {}  # log_height -> next alpha exponent
    P = F.P
    for batch, (opening, (commit, mats)) in enumerate(
        zip(input_openings, commitments_with_opening_points)
    ):
        for m, (dom, points_and_values) in enumerate(mats):
            log_height = dom.log_n + params.log_blowup
            bits_reduced = log_global_max_height - log_height
            w = len(points_and_values[0][1])
            rows = np.array(
                [opening.opened_values[q][m] for q in range(Q)],
                dtype=np.uint64,
            )
            if rows.shape[1] < w:
                raise FriError("PointEvaluationCountMismatch")
            # hiding MMCS rows carry trailing leaf salts — polynomial
            # data is the width the claimed values bind (mmcs checks the
            # salted width)
            rows = rows[:, :w]
            # query points x_q = GENERATOR * g^rev(idx)
            g = F.two_adic_generator_h(log_height)
            xs = [
                F.mul_h(
                    F.GENERATOR,
                    F.exp_h(
                        g,
                        reverse_bits_len(
                            index >> bits_reduced, log_height
                        ),
                    ),
                )
                for index in indices
            ]
            k0 = offsets.setdefault(log_height, 0)
            ap = np.array(alpha_pows[k0 : k0 + w], dtype=np.uint64)
            # Mred0[q] = sum_j alpha^(k0+j) * row[q, j]
            mred0 = [
                ((rows * ap[None, :, d]) % P).sum(axis=1) % P
                for d in range(E.D)
            ]
            mred0 = [
                tuple(int(mred0[d][q]) for d in range(E.D))
                for q in range(Q)
            ]
            for p_i, (z, ps_at_z) in enumerate(points_and_values):
                if len(ps_at_z) != w:
                    raise FriError("PointEvaluationCountMismatch")
                # C = sum_j alpha^(k0 + p_i*w + j) * ps_at_z[j]
                scale = E.exp_h(alpha, p_i * w)
                c_z = E.zero_h()
                for j, pz in enumerate(ps_at_z):
                    c_z = E.add_h(c_z, E.mul_h(alpha_pows[k0 + j], pz))
                c_z = E.mul_h(scale, c_z)
                for q, index in enumerate(indices):
                    denom = E.sub_h(z, E.from_base_h(xs[q]))
                    if denom == E.zero_h():
                        raise FriError("OpeningPointMatchesQueryPoint")
                    mred = E.mul_h(scale, mred0[q])
                    quot = E.mul_h(
                        E.sub_h(c_z, mred), E.inv_h(denom)
                    )
                    accs[q][log_height] = E.add_h(
                        accs[q].get(log_height, E.zero_h()), quot
                    )
            offsets[log_height] = k0 + len(points_and_values) * w

    out = []
    for q in range(Q):
        acc = accs[q]
        if (
            params.log_blowup in acc
            and acc[params.log_blowup] != E.zero_h()
        ):
            raise FriError("FinalPolyMismatch (height-1 quotient nonzero)")
        out.append(
            sorted(((lh, v) for lh, v in acc.items()), key=lambda t: -t[0])
        )
    return out
