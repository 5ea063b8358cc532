"""FRI prover: device commit-phase folding, host transcript.

Protocol parity with `fri/src/prover.rs:43` (prove_fri) and `:192`
(commit_phase):
  per round: reshape the bit-reversed codeword to width-arity rows ->
  commit -> observe -> grind(commit_pow) -> sample beta -> fold ->
  roll in the next input scaled by beta^arity.
Then: final-poly iDFT (truncate, bitrev, idft — prover.rs:271-274),
observe coefficients, observe the arity schedule, grind(query_pow),
sample query indices, open everything.

The fold kernel is the TPU analog of `fold_matrix`
(`fri/src/two_adic_pcs.rs:134-218`): the codeword is bit-reversed so
conjugate points are adjacent — each arity-2 step is a reshape + one
extension multiply per output element:
    new[i] = (lo+hi)/2 + (lo-hi)·beta·hip[i],  hip = bitrev(g^{-i}/2).
Arity 2^k decomposes into k such steps with beta, beta^2, ..., beta^{2^{k-1}}.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.extension import BinomialExtension
from ..merkle.extension_mmcs import ExtensionMmcs
from ..ops.ntt import idft, powers_device
from ..utils.bits import bitrev_permute_axis0, log2_strict
from .config import FriParameters, compute_log_arity_for_round
from .proof import BatchMultiOpening, CommitPhaseStep, FriProof


def _halve_inv_powers(F, log_h: int):
    """bitrev([g^{-i}/2, i < 2^log_h]) with g = two_adic_gen(log_h+1)."""
    g_inv = F.inv_h(F.two_adic_generator_h(log_h + 1))
    p = powers_device(F, g_inv, 1 << log_h, scale_std=F.inv_h(2))
    return bitrev_permute_axis0(p, log_h)


@partial(jax.jit, static_argnames=("E",))
def _fold_step_jit(E: BinomialExtension, folded, beta_m):
    F = E.base
    h2, D = folded.shape
    h = h2 // 2
    m = folded.reshape(h, 2, D)
    lo, hi = m[:, 0], m[:, 1]
    hip = _halve_inv_powers(F, log2_strict(h))
    even = F.halve(F.add(lo, hi))
    odd = E.mul(F.sub(lo, hi), beta_m)
    return F.add(even, E.base_mul(hip, odd))


def fold_step_device(E: BinomialExtension, folded, beta_host):
    """One arity-2 fold of a bit-reversed ext codeword (2h, D) -> (h, D)."""
    return _fold_step_jit(E, folded, jnp.asarray(E.to_monty_np(beta_host)))


def fold_step_np(E: BinomialExtension, folded, beta_host):
    """Numpy fold step (exact host; for small heights, zero compiles)."""
    F = E.base
    from ..utils.bits import bitrev_indices

    h2, D = folded.shape
    h = h2 // 2
    m = folded.reshape(h, 2, D)
    lo, hi = m[:, 0], m[:, 1]
    g_inv = F.inv_h(F.two_adic_generator_h(log2_strict(h) + 1))
    from ..ops.ntt import powers_np

    hip = powers_np(F, g_inv, h, scale_std=F.inv_h(2))
    hip = hip[bitrev_indices(log2_strict(h))] if h > 1 else hip
    even = F.halve_np(F.add_np(lo, hi))
    odd = E.mul_np(F.sub_np(lo, hi), E.to_monty_np(beta_host))
    return F.add_np(even, E.base_mul_np(hip, odd))


def fold_matrix_device(E: BinomialExtension, folded, beta_host, log_arity):
    """Arity-2^k fold as k arity-2 steps with beta^(2^j)."""
    b = beta_host
    is_np = isinstance(folded, np.ndarray)
    for _ in range(log_arity):
        folded = (fold_step_np if is_np else fold_step_device)(
            E, folded, b
        )
        b = E.mul_h(b, b)
    return folded


class TwoAdicFriFolding:
    """Default folding strategy (fri/src/two_adic_pcs.rs fold_matrix):
    arity-2^k folds of bit-reversed codewords over two-adic cosets."""

    extra_query_index_bits = 0
    # the two-adic FRI binds the (variable) arity schedule into the
    # transcript (fri/src/prover.rs:103); circle FRI has fixed arity 2 and
    # does not (circle/src/prover.rs has no such observe)
    observe_arity_schedule = True
    # two-adic FRI scales each rolled-in reduced opening by beta^arity
    # (fri/src/prover.rs:258-265); circle FRI adds unscaled — its DEEP
    # quotients already carry per-height alpha offsets
    # (circle/src/prover.rs:162: `*c += x`)
    scale_roll_in = True

    def __init__(self, E):
        self.E = E

    def fold_matrix(self, folded, beta, log_arity):
        return fold_matrix_device(self.E, folded, beta, log_arity)


def prove_fri(
    E: BinomialExtension,
    params: FriParameters,
    fri_mmcs: ExtensionMmcs,
    inputs: list,  # device (h, D) ext codewords, heights strictly desc
    challenger,
    log_global_max_height: int,
    open_input_fn,  # (indices) -> list[BatchMultiOpening]
    spans=None,
    folding=None,  # FriFoldingStrategy analog; default two-adic
) -> FriProof:
    import time as _time

    _t = {"last": _time.perf_counter()}

    def _mark(name):
        if spans is not None:
            now = _time.perf_counter()
            spans[name] = spans.get(name, 0.0) + now - _t["last"]
            _t["last"] = now

    F = E.base
    if folding is None:
        folding = TwoAdicFriFolding(E)
    assert inputs and params.num_queries > 0 and params.max_log_arity > 0
    assert log_global_max_height == log2_strict(inputs[0].shape[0])

    # ---- commit phase (prover.rs:192) ----
    folded = inputs[0]
    rest = list(inputs[1:])
    commits, datas, log_arities, pow_witnesses = [], [], [], []
    log_final_height = params.log_blowup + params.log_final_poly_len

    # below this height the round runs on host numpy (exact): the work is
    # tiny and an XLA compile per fresh height would dominate wall-clock.
    # With a C-keccak-backed commit sponge the host tree is ~2 Mhash/s,
    # so pulling the codeword earlier trades one extra device round
    # (29 ms root round-trip each) for ~5 ms of host hashing.
    _sponge = getattr(getattr(fri_mmcs, "inner", fri_mmcs), "sponge", None)
    LOG_H_DEVICE_MIN = (
        16 if not getattr(_sponge, "digest_is_field", True) else 13
    )

    while folded.shape[0] > params.blowup * params.final_poly_len:
        log_h = log2_strict(folded.shape[0])
        if log_h < LOG_H_DEVICE_MIN and not isinstance(folded, np.ndarray):
            folded = np.asarray(folded)
        next_log_h = log2_strict(rest[0].shape[0]) if rest else None
        log_arity = compute_log_arity_for_round(
            log_h, next_log_h, log_final_height, params.max_log_arity
        )
        arity = 1 << log_arity
        log_arities.append(log_arity)

        # width-arity ext matrix of adjacent (conjugate) evals (NCOLS =
        # wire columns per ext element; == E.D except for 64-bit fields
        # whose elements span two u32 limb lanes — gl/field.py)
        leaves = folded.reshape(-1, arity, getattr(E, "NCOLS", E.D))
        data = fri_mmcs.commit_ext_matrix(leaves)
        commits.append(data.commitment)
        challenger.observe_digest(data.commitment)
        pow_witnesses.append(challenger.grind(params.commit_proof_of_work_bits))
        beta = challenger.sample_ext(E.D)

        folded = folding.fold_matrix(folded, beta, log_arity)
        datas.append(data)

        if rest and rest[0].shape[0] == folded.shape[0]:
            nxt = rest.pop(0)
            if getattr(folding, "scale_roll_in", True):
                beta_pow = beta
                for _ in range(log_arity):
                    beta_pow = E.mul_h(beta_pow, beta_pow)
            else:
                beta_pow = E.one_h()
            if isinstance(folded, np.ndarray):
                folded = F.add_np(
                    folded,
                    E.mul_np(np.asarray(nxt), E.to_monty_np(beta_pow)),
                )
            else:
                folded = F.add(
                    folded, E.mul(nxt, jnp.asarray(E.to_monty_np(beta_pow)))
                )

    _mark("fri: commit phase")
    # ---- final polynomial (prover.rs:271) ----
    L = params.final_poly_len
    final_evals = folded[:L]  # bitrev prefix = restriction to subgroup H_L
    if L > 1:
        final_evals = bitrev_permute_axis0(final_evals, log2_strict(L))
        idft_fn = getattr(folding, "idft_final", None)
        final_coeffs = (
            idft_fn(final_evals) if idft_fn is not None
            else idft(F, final_evals)
        )
    else:
        final_coeffs = final_evals
    fc = F.from_monty_np(np.asarray(final_coeffs))
    final_poly = [tuple(int(c) for c in row) for row in fc]
    for coeff in final_poly:
        challenger.observe_ext(coeff)

    # bind the arity schedule (prover.rs:103; two-adic only)
    if getattr(folding, "observe_arity_schedule", True):
        for la in log_arities:
            challenger.observe(la)

    # query phase
    _mark("fri: final poly")
    query_pow = challenger.grind(params.query_proof_of_work_bits)
    extra = folding.extra_query_index_bits
    indices = [
        challenger.sample_bits(log_global_max_height + extra)
        for _ in range(params.num_queries)
    ]

    _mark("fri: grind+indices")
    # ONE shared device->host round-trip for every tree touched by the
    # query phase: input trees + all commit-phase trees register their
    # gathers on the batcher, then a single flush resolves them.
    from ..merkle.mmcs import PullBatcher

    batcher = PullBatcher()
    try:
        input_finish = open_input_fn(indices, batcher)
    except TypeError:
        input_finish = None
    steps_finish = _answer_queries(
        E, fri_mmcs, log_arities, datas, [i >> extra for i in indices],
        batcher,
    )
    batcher.flush()
    input_openings = (
        input_finish() if input_finish is not None
        else open_input_fn(indices)
    )
    commit_phase_steps = steps_finish()

    _mark("fri: query openings")
    return FriProof(
        commit_phase_commits=commits,
        commit_pow_witnesses=pow_witnesses,
        input_openings=input_openings,
        commit_phase_steps=commit_phase_steps,
        final_poly=final_poly,
        query_pow_witness=query_pow,
    )


def _answer_queries(E, fri_mmcs, log_arities, datas, start_indices,
                    batcher):
    """Sibling values + paths per round (prover.rs answer_queries:308).

    Registers the per-round gathers on `batcher` and returns a finisher
    to call after the flush."""
    futs = []
    indices = list(start_indices)
    for log_arity, data in zip(log_arities, datas):
        row_indices = [idx >> log_arity for idx in indices]
        futs.append((log_arity, list(indices),
                     batcher.add(fri_mmcs, data, row_indices)))
        indices = row_indices

    def finish():
        steps = []
        for log_arity, idx_list, fut in futs:
            arity = 1 << log_arity
            ext_pq, pruned = fut.value
            sibs = []
            for idx, ext_rows in zip(idx_list, ext_pq):
                group = ext_rows[0]  # single matrix per round
                pos = idx % arity
                sibs.append([g for j, g in enumerate(group) if j != pos])
            steps.append(
                CommitPhaseStep(
                    log_arity=log_arity,
                    sibling_values=sibs,
                    opening_proof=pruned,
                )
            )
        return steps

    return finish
