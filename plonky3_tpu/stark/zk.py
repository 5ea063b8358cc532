"""ZK uni-stark prove/verify (uni-stark/src/prover.rs:120-380 with
`SC::Pcs::ZK = true`; verifier.rs ZK branches).

Differences from the transparent path:
  * the trace is committed over the DOUBLED domain through HidingFriPcs
    (random rows interleaved + random codeword columns + salted leaves),
  * num_quotient_chunks doubles and the chunk LDEs are masked with
    v_{H_i}·t_i (hiding_pcs.commit_quotient),
  * a random extension poly R over the doubled domain is committed and
    opened at ζ (round 0 of the FRI batch) to blind the batch polynomial,
  * degree_bits in the proof is log_ext_degree = log n + 1; selectors
    and Z_H still use the ORIGINAL trace domain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..air.api import (
    BaseAir,
    _make_builder,
    get_log_num_quotient_chunks,
    get_symbolic_layout,
)
from ..air.builder import VerifierBackend
from ..utils.bits import log2_strict
from .config import StarkConfig
from .proof import Commitments, OpenedValues, Proof
from .prover import quotient_values
from .verifier import VerificationError


def prove_zk(config: StarkConfig, air: BaseAir, trace, public_values):
    F, E, pcs = config.F, config.E, config.pcs
    n = trace.shape[0]
    log_n = log2_strict(n)
    log_ext = log_n + 1

    log_num_chunks = get_log_num_quotient_chunks(air)
    num_chunks = 1 << (log_num_chunks + 1)  # ZK doubles the chunk count

    trace_domain = pcs.natural_domain_for_degree(n)
    ext_trace_domain = pcs.natural_domain_for_degree(2 * n)
    trace_data = pcs.commit([(ext_trace_domain, trace)])

    ch = config.initialise_challenger()
    ch.observe(log_ext)
    ch.observe(log_n)
    ch.observe(0)  # preprocessed width
    ch.observe_digest(trace_data.root_std)
    ch.observe_many(public_values)

    alpha = ch.sample_ext(E.D)

    quotient_domain = ext_trace_domain.create_disjoint_domain(
        1 << (log_ext + log_num_chunks)
    )
    trace_on_qd = pcs.get_evaluations_on_domain(
        trace_data, 0, quotient_domain
    )
    num_constraints, _ = get_symbolic_layout(air)
    alpha_pows = E.powers_np(alpha, num_constraints)[::-1].copy()
    publics_m = (
        jnp.asarray(F.to_monty_np(np.asarray(public_values, np.uint32)))
        if public_values
        else jnp.zeros((0,), jnp.uint32)
    )
    q_vals = quotient_values(
        config, air, trace_domain, quotient_domain,
        trace_on_qd, publics_m, jnp.asarray(alpha_pows),
    )
    q_flat = q_vals.reshape(quotient_domain.size, E.D)
    quotient_data = pcs.commit_quotient(quotient_domain, q_flat, num_chunks)
    ch.observe_digest(quotient_data.root_std)

    r_commit, r_data = pcs.get_opt_randomization_poly_commitment(
        ext_trace_domain
    )
    ch.observe_digest(r_commit)

    zeta = ch.sample_ext(E.D)
    zeta_next = trace_domain.next_point_ext(E, zeta)

    (rand_cw, opened), fri_proof = pcs.open(
        [
            (r_data, [[zeta]]),
            (trace_data, [[zeta, zeta_next]]),
            (quotient_data, [[zeta]] * num_chunks),
        ],
        ch,
    )
    return Proof(
        commitments=Commitments(
            trace=trace_data.root_std,
            quotient_chunks=quotient_data.root_std,
            random=r_commit,
        ),
        opened_values=OpenedValues(
            trace_local=opened[1][0][0],
            trace_next=opened[1][0][1],
            quotient_chunks=[opened[2][i][0] for i in range(num_chunks)],
            random=opened[0][0][0],
            random_codewords=rand_cw,
        ),
        opening_proof=fri_proof,
        degree_bits=log_ext,
    )


def verify_zk(config: StarkConfig, air: BaseAir, proof: Proof,
              public_values):
    F, E, pcs = config.F, config.E, config.pcs
    log_ext = proof.degree_bits
    log_n = log_ext - 1
    n = 1 << log_n
    if proof.commitments.random is None or proof.opened_values.random is None:
        raise VerificationError("MissingRandomization")

    log_num_chunks = get_log_num_quotient_chunks(air)
    num_chunks = 1 << (log_num_chunks + 1)
    ov = proof.opened_values
    if (
        len(ov.trace_local) != air.width
        or len(ov.trace_next) != air.width
        or len(ov.quotient_chunks) != num_chunks
        or any(len(c) != E.D for c in ov.quotient_chunks)
        or len(ov.random) != E.D
    ):
        raise VerificationError("InvalidProofShape")

    trace_domain = pcs.natural_domain_for_degree(n)
    ext_trace_domain = pcs.natural_domain_for_degree(2 * n)
    quotient_domain = ext_trace_domain.create_disjoint_domain(
        1 << (log_ext + log_num_chunks)
    )
    chunk_domains = quotient_domain.split_domains(num_chunks)

    ch = config.initialise_challenger()
    ch.observe(log_ext)
    ch.observe(log_n)
    ch.observe(0)
    ch.observe_digest(proof.commitments.trace)
    ch.observe_many(public_values)
    alpha = ch.sample_ext(E.D)
    ch.observe_digest(proof.commitments.quotient_chunks)
    ch.observe_digest(proof.commitments.random)
    zeta = ch.sample_ext(E.D)
    zeta_next = trace_domain.next_point_ext(E, zeta)

    if trace_domain.vanishing_poly_at_point_ext(E, zeta) == E.zero_h():
        raise VerificationError("OodPointInDomain")

    rounds = [
        (
            proof.commitments.random,
            [(ext_trace_domain, [(zeta, ov.random)])],
        ),
        (
            proof.commitments.trace,
            [
                (
                    ext_trace_domain,
                    [(zeta, ov.trace_local), (zeta_next, ov.trace_next)],
                )
            ],
        ),
        (
            proof.commitments.quotient_chunks,
            [
                # ZK quotient chunks are committed at blowup+1
                # (hiding_pcs.commit_quotient): report one extra log of
                # domain size so the PCS height bookkeeping matches the
                # committed trees (the recomposition below keeps using
                # the true chunk_domains)
                (
                    type(dom)(F=F, shift=dom.shift, log_n=dom.log_n + 1),
                    [(zeta, vals)],
                )
                for dom, vals in zip(chunk_domains, ov.quotient_chunks)
            ],
        ),
    ]

    from ..fri.verifier import FriError

    try:
        pcs.verify(rounds, ov.random_codewords, proof.opening_proof, ch)
    except FriError as e:
        raise VerificationError(f"InvalidOpeningArgument: {e}") from e

    # recompose Q(ζ) (identical to the transparent path, 2x chunks)
    zps = []
    for i, dom in enumerate(chunk_domains):
        acc = E.one_h()
        for j, other in enumerate(chunk_domains):
            if j == i:
                continue
            num = other.vanishing_poly_at_point_ext(E, zeta)
            den = other.vanishing_poly_at_point_ext(
                E, E.from_base_h(dom.first_point())
            )
            acc = E.mul_h(acc, E.mul_h(num, E.inv_h(den)))
        zps.append(acc)
    quotient = E.zero_h()
    for zp, chunk in zip(zps, ov.quotient_chunks):
        val = E.zero_h()
        for d, c in enumerate(chunk):
            basis = [0] * E.D
            basis[d] = 1
            val = E.add_h(val, E.mul_h(c, tuple(basis)))
        quotient = E.add_h(quotient, E.mul_h(zp, val))

    sels = trace_domain.selectors_at_point_ext(E, zeta)
    backend = VerifierBackend(E, alpha)

    def entry(kind, j):
        if kind == "local":
            return ov.trace_local[j]
        if kind == "next":
            return ov.trace_next[j]
        return sels[kind]

    builder = _make_builder(
        backend, air.width, air.num_public_values, entry,
        lambda j: E.from_base_h(public_values[j]),
    )
    air.eval(builder)
    folded = backend.acc
    if E.mul_h(folded, sels["inv_vanishing"]) != quotient:
        raise VerificationError("OodEvaluationMismatch")
