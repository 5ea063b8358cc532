"""STIR prover (stir/src/prover.rs, Construction 5.2).

Codewords are natural-order (N, D) Monty numpy arrays over the extension;
the N-sized work (folds, coset DFTs, quotient/degree-correction sweeps)
is vectorized array math riding the shared NTT kernels, while the
transcript-sized work (OOD answers, Ans/shake interpolation) stays host
exact. Before committing, a codeword is arranged as a (new_height x
arity) fiber matrix so one MMCS opening reveals a whole fiber
(prover.rs:1-7).
"""

from __future__ import annotations

import numpy as np

from ..utils.bits import log2_strict
from .proof import StirProof, StirQueryOpenings, StirRoundProof
from .utils import (
    coeffs_from_codeword,
    codeword_from_coeffs,
    compute_shake_polynomial,
    fold_codeword_np,
    fold_domain_params,
    interpolate_poly,
    next_domain_shift,
    sample_ood_points,
    vanishing_poly_from_roots,
)


def _ext_powers_np(E, z, n):
    """[1, z, ..., z^{n-1}] as (n, D) Monty via log-depth doubling:
    out[m:2m) = out[:m) · z^m (vectorized), squaring z^m each pass."""
    out = np.zeros((max(n, 1), E.D), dtype=np.uint32)
    out[0] = np.asarray(E.to_monty_np(E.one_h()))
    m = 1
    zpow = z  # z^m
    while m < n:
        k = min(m, n - m)
        out[m : m + k] = E.mul_np(out[:k], np.asarray(E.to_monty_np(zpow)))
        m += k
        zpow = E.mul_h(zpow, zpow)
    return out


def eval_coeffs_at_ext_point(E, coeffs_m, z):
    """Σ c_i z^i for (n, D) Monty coefficients at an ext point (host
    std tuple), vectorized over the coefficient axis."""
    n = coeffs_m.shape[0]
    if n == 0:
        return E.zero_h()
    zp = _ext_powers_np(E, z, n)
    prods = E.mul_np(np.asarray(coeffs_m), zp)
    # sum over axis 0 in 64-bit then reduce
    acc = prods.astype(np.uint64).sum(axis=0) % np.uint64(E.base.P)
    return E.from_monty_np(acc.astype(np.uint32))


def commit_as_fiber_matrix(E, mmcs, codeword_m, log_arity):
    """(N, D) natural codeword -> (N/k, k, D) fiber matrix, committed.
    Row j = [cw[j], cw[j+nh], ..., cw[j+(k-1)nh]] (prover.rs:5-7)."""
    N = codeword_m.shape[0]
    arity = 1 << log_arity
    nh = N // arity
    mat = np.asarray(codeword_m).reshape(arity, nh, E.D).transpose(1, 0, 2)
    data = mmcs.commit_ext_matrices([np.ascontiguousarray(mat)])
    return data


def _open_fiber_rows(E, mmcs, indices, data):
    rows_pq, pruned = mmcs.open_multi_batch(data, list(indices))
    return StirQueryOpenings(
        row_evals=[rows[0] for rows in rows_pq], proof=pruned
    )


def prove_stir(config, poly_coeffs, challenger):
    """Prove low degree of an ext-coefficient polynomial (prover.rs:42).

    poly_coeffs: (m, D) Monty numpy, m <= 2^log_starting_degree."""
    E, F = config.E, config.F
    log_dom = config.log_starting_domain_size
    coeffs = np.zeros((1 << config.log_starting_degree, E.D), np.uint32)
    coeffs[: poly_coeffs.shape[0]] = np.asarray(poly_coeffs)
    initial = codeword_from_coeffs(E, coeffs, F.GENERATOR, log_dom)
    return prove_stir_from_codeword(config, initial, challenger)


def prove_stir_from_codeword(config, initial_codeword, challenger):
    return _prove_stir_inner(config, initial_codeword, challenger, True)


def prove_stir_from_external_codeword(config, initial_codeword, challenger):
    """Initial oracle pre-bound by the caller: not committed, its query
    fibers are not shipped (prover.rs:70-100; soundness requirement on
    the caller documented there)."""
    return _prove_stir_inner(config, initial_codeword, challenger, False)


def _prove_round(config, rnd, challenger, cur_cw, cur_shift, cur_log_dom,
                 cur_data):
    import jax.numpy as jnp

    E, F = config.E, config.F
    rc = config.round_configs[rnd]
    log_arity = rc.log_folding_factor
    arity = 1 << log_arity

    fold_log_dom, fold_shift = fold_domain_params(
        F, cur_shift, cur_log_dom, log_arity
    )
    next_log_dom = cur_log_dom - 1
    next_shift = next_domain_shift(F, cur_shift, log_arity)

    # Step 1: fold (gamma after the folding PoW)
    folding_pow_witness = challenger.grind(rc.folding_pow_bits)
    gamma = challenger.sample_ext(E.D)
    fold_beta = E.base_mul_h(F.inv_h(cur_shift), gamma)
    folded = fold_codeword_np(E, cur_cw, fold_beta, log_arity, cur_log_dom)
    fold_coeffs = coeffs_from_codeword(E, folded, fold_shift)

    next_commit_cw = codeword_from_coeffs(
        E, fold_coeffs, next_shift, next_log_dom
    )
    new_data = commit_as_fiber_matrix(
        E, config.mmcs, next_commit_cw, config.log_folding_factor
    )
    challenger.observe_digest(new_data.root_std)

    # Step 2: OOD samples outside current/next/fold domains
    ood_points = sample_ood_points(
        E, challenger,
        [
            (cur_shift, cur_log_dom),
            (next_shift, next_log_dom),
            (fold_shift, fold_log_dom),
        ],
        rc.num_ood_samples,
    )
    folded_degree_bound = 1 << (rc.log_degree - log_arity)
    trunc = fold_coeffs[: min(folded_degree_bound, fold_coeffs.shape[0])]
    ood_answers = [
        eval_coeffs_at_ext_point(E, trunc, z) for z in ood_points
    ]
    for y in ood_answers:
        challenger.observe_ext(y)

    # Step 3: query-phase PoW
    pow_witness = challenger.grind(rc.pow_bits)

    # Step 4: queries (unbiased indices; dedup on first occurrence)
    g_fold = F.two_adic_generator_h(fold_log_dom)
    r_comb = challenger.sample_ext(E.D)
    query_indices = []
    query_points, query_answers = [], []
    seen = set()
    folded_std_cache = {}
    for _ in range(rc.num_queries):
        j = challenger.sample_uniform_bits(fold_log_dom)
        query_indices.append(j)
        if j not in seen:
            seen.add(j)
            pt = E.from_base_h(F.mul_h(fold_shift, F.exp_h(g_fold, j)))
            query_points.append(pt)
            if j not in folded_std_cache:
                folded_std_cache[j] = E.from_monty_np(folded[j])
            query_answers.append(folded_std_cache[j])

    query_openings = (
        _open_fiber_rows(E, config.mmcs, query_indices, cur_data)
        if cur_data is not None
        else None
    )

    # Step 4b: Ans + shake polynomials, bound before rho
    all_points = list(ood_points) + query_points
    all_values = list(ood_answers) + query_answers
    ans_poly = interpolate_poly(E, all_points, all_values)
    shake_poly = compute_shake_polynomial(E, ans_poly, all_points)
    for c in ans_poly:
        challenger.observe_ext(c)
    for c in shake_poly:
        challenger.observe_ext(c)
    challenger.sample_ext(E.D)  # rho: sampled and discarded by prover

    # Step 5: next virtual witness f' = DegCor((g - Ans) / Z) on L_{i+1}
    N = 1 << next_log_dom
    num_answers = len(all_points)
    vanishing = vanishing_poly_from_roots(E, all_points)

    def low_degree_evals(poly):
        m = 1
        while m < len(poly):
            m <<= 1
        cm = np.zeros((m, E.D), np.uint32)
        for i, c in enumerate(poly):
            cm[i] = np.asarray(E.to_monty_np(c))
        return codeword_from_coeffs(E, cm, next_shift, next_log_dom)

    ans_evals = low_degree_evals(ans_poly if ans_poly else [E.zero_h()])
    van_evals = low_degree_evals(vanishing)

    from ..ops.ntt import powers_np

    g_next = F.two_adic_generator_h(next_log_dom)
    r_comb_m = np.asarray(E.to_monty_np(r_comb))
    xs = np.asarray(powers_np(F, g_next, N, scale_std=next_shift))
    step = E.base_mul_np(xs, r_comb_m)  # (N, D): r_comb * x_j
    one_m = np.asarray(E.to_monty_np(E.one_h()))
    combined = E.mul_np(van_evals, E.sub_np(one_m, step))

    # numerator 1 - (r_comb x)^{num_answers+1}
    na1 = num_answers + 1
    g_hi = F.exp_h(g_next, na1)
    shift_hi = F.exp_h(next_shift, na1)
    xs_hi = np.asarray(powers_np(F, g_hi, N, scale_std=shift_hi))
    r_hi = np.asarray(E.to_monty_np(E.exp_h(r_comb, na1)))
    numer = E.sub_np(one_m, E.base_mul_np(xs_hi, r_hi))

    inv_combined = np.asarray(E.inv(jnp.asarray(combined)))
    next_cw = E.mul_np(
        E.mul_np(E.sub_np(next_commit_cw, ans_evals), inv_combined),
        numer,
    )

    proof = StirRoundProof(
        commitment=tuple(new_data.root_std),
        folding_pow_witness=folding_pow_witness,
        ood_answers=ood_answers,
        pow_witness=pow_witness,
        ans_polynomial=ans_poly,
        shake_polynomial=shake_poly,
        query_openings=query_openings,
    )
    return (proof, next_cw, new_data, next_shift, next_log_dom,
            sorted(seen))


def _prove_final_round(config, challenger, cur_cw, cur_shift, cur_log_dom,
                       cur_data):
    E, F = config.E, config.F
    log_arity = config.log_folding_factor
    final_log_dom, final_shift = fold_domain_params(
        F, cur_shift, cur_log_dom, log_arity
    )

    final_folding_pow = challenger.grind(config.final_folding_pow_bits)
    final_gamma = challenger.sample_ext(E.D)
    beta = E.base_mul_h(F.inv_h(cur_shift), final_gamma)
    final_cw = fold_codeword_np(E, cur_cw, beta, log_arity, cur_log_dom)

    # small iDFT on the stride-subsampled coset (prover.rs:434-441)
    final_len = config.final_poly_len
    stride = final_cw.shape[0] // final_len
    sub = final_cw[::stride][:final_len]
    sub_shift = final_shift  # subgroup coset of size final_len
    final_poly_m = coeffs_from_codeword(E, sub, sub_shift)
    final_poly = [
        E.from_monty_np(final_poly_m[i]) for i in range(final_len)
    ]

    for c in final_poly:
        challenger.observe_ext(c)
    final_pow = challenger.grind(config.final_pow_bits)

    final_indices = []
    seen = set()
    for _ in range(config.final_queries):
        j = challenger.sample_uniform_bits(final_log_dom)
        final_indices.append(j)
        seen.add(j)

    final_openings = (
        _open_fiber_rows(E, config.mmcs, final_indices, cur_data)
        if cur_data is not None
        else None
    )
    return (final_poly, final_folding_pow, final_pow, final_openings,
            sorted(seen))


def _prove_stir_inner(config, initial_codeword, challenger, commit_initial):
    E, F = config.E, config.F
    log_dom = config.log_starting_domain_size
    assert initial_codeword.shape[0] == 1 << log_dom

    initial_commit = None
    cur_data = None
    if commit_initial:
        cur_data = commit_as_fiber_matrix(
            E, config.mmcs, initial_codeword, config.log_folding_factor
        )
        initial_commit = tuple(cur_data.root_std)
        challenger.observe_digest(cur_data.root_std)

    cur_cw, cur_shift, cur_log_dom = initial_codeword, F.GENERATOR, log_dom
    round_proofs = []
    first_round_query_indices = []
    for rnd in range(config.num_rounds):
        (proof, cur_cw, cur_data, cur_shift, cur_log_dom, seen) = (
            _prove_round(config, rnd, challenger, cur_cw, cur_shift,
                         cur_log_dom, cur_data)
        )
        if rnd == 0:
            first_round_query_indices = seen
        round_proofs.append(proof)

    (final_poly, ffp, fp, final_openings, final_seen) = _prove_final_round(
        config, challenger, cur_cw, cur_shift, cur_log_dom, cur_data
    )
    if config.num_rounds == 0:
        first_round_query_indices = final_seen

    proof = StirProof(
        initial_commitment=initial_commit,
        round_proofs=round_proofs,
        final_polynomial=final_poly,
        final_folding_pow_witness=ffp,
        final_pow_witness=fp,
        final_query_openings=final_openings,
    )
    return proof, first_round_query_indices
