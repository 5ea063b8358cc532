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

    # fold chains
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
            # authenticate the opened group against the round commitment
            ok = fri_mmcs.verify_batch(
                proof.commit_phase_commits[r],
                [(1 << log_folded, arity)],
                domain_index,
                [group],
                step.opening_proofs[query],
            )
            if not ok:
                raise FriError(f"CommitPhaseMmcsError round {r}")
            log_current = log_folded
            if ro_iter and ro_iter[0][0] == log_folded:
                beta_pow = beta
                for _ in range(log_arity):
                    beta_pow = E.mul_h(beta_pow, beta_pow)
                folded_eval = E.add_h(
                    folded_eval, E.mul_h(beta_pow, ro_iter.pop(0)[1])
                )
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
    (verifier.rs open_inputs:617)."""
    F = E.base
    if len(input_openings) != len(commitments_with_opening_points):
        raise FriError("InputProofBatchCountMismatch")

    # authenticate
    for batch, (opening, (commit, mats)) in enumerate(
        zip(input_openings, commitments_with_opening_points)
    ):
        if len(opening.opened_values) != len(indices):
            raise FriError(f"InputOpeningsQueryCountMismatch batch {batch}")
        heights = [dom.size << params.log_blowup for (dom, _) in mats]
        dims = []
        for m, (dom, points_and_values) in enumerate(mats):
            if not points_and_values:
                raise FriError(f"MatrixWithoutOpeningPoints {batch},{m}")
            width = len(points_and_values[0][1])
            dims.append((heights[m], width))
        bits_reduced = log_global_max_height - max(heights).bit_length() + 1
        for q, index in enumerate(indices):
            if len(opening.opened_values[q]) != len(mats):
                raise FriError(f"BatchOpenedValuesCountMismatch batch {batch}")
            ok = input_mmcs.verify_batch(
                commit,
                dims,
                index >> bits_reduced,
                opening.opened_values[q],
                opening.opening_proofs[q],
            )
            if not ok:
                raise FriError(f"InputError batch {batch} query {q}")

    # reduce
    out = []
    for q, index in enumerate(indices):
        acc = {}  # log_height -> [alpha_pow, reduced]
        for batch, (opening, (commit, mats)) in enumerate(
            zip(input_openings, commitments_with_opening_points)
        ):
            for m, (dom, points_and_values) in enumerate(mats):
                log_height = dom.log_n + params.log_blowup
                bits_reduced = log_global_max_height - log_height
                rev_idx = reverse_bits_len(index >> bits_reduced, log_height)
                x = F.mul_h(
                    F.GENERATOR,
                    F.exp_h(F.two_adic_generator_h(log_height), rev_idx),
                )
                entry = acc.setdefault(log_height, [E.one_h(), E.zero_h()])
                row = opening.opened_values[q][m]
                for p, (z, ps_at_z) in enumerate(points_and_values):
                    if len(row) != len(ps_at_z):
                        raise FriError("PointEvaluationCountMismatch")
                    denom = E.sub_h(z, E.from_base_h(x))
                    if denom == E.zero_h():
                        raise FriError("OpeningPointMatchesQueryPoint")
                    inv_denom = E.inv_h(denom)
                    for p_at_x, p_at_z in zip(row, ps_at_z):
                        quot = E.mul_h(
                            E.sub_h(p_at_z, E.from_base_h(p_at_x)), inv_denom
                        )
                        entry[1] = E.add_h(
                            entry[1], E.mul_h(entry[0], quot)
                        )
                        entry[0] = E.mul_h(entry[0], alpha)
        if params.log_blowup in acc and acc[params.log_blowup][1] != E.zero_h():
            raise FriError("FinalPolyMismatch (height-1 quotient nonzero)")
        out.append(
            sorted(
                ((lh, v[1]) for lh, v in acc.items()), key=lambda t: -t[0]
            )
        )
    return out
