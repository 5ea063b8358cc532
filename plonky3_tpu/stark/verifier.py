"""uni-stark verifier (uni-stark/src/verifier.rs:273, no-ZK).

Replays the prover transcript, validates proof shape, runs the PCS
verification, recomposes the quotient from its chunks
(recompose_quotient_from_chunks :98) and checks
C_fold(ζ)/Z_H(ζ) == Q(ζ) (verify_constraints :142 —
OodEvaluationMismatch otherwise).
"""

from __future__ import annotations

from ..air.api import BaseAir, _make_builder, get_log_num_quotient_chunks
from ..air.builder import VerifierBackend
from .config import StarkConfig
from .proof import Proof


class VerificationError(Exception):
    """Base verification failure (uni-stark/src/error.rs:10).

    Typed subclasses mirror the reference's enum variants so callers can
    match on the failure class instead of parsing message strings; the
    base class is preserved for backwards-compatible `except` clauses.
    """


class InvalidProofShape(VerificationError):
    """Structural mismatch: widths, chunk counts, degree bounds."""


class OodPointInDomain(VerificationError):
    """The sampled out-of-domain point landed on the trace domain."""


class InvalidOpeningArgument(VerificationError):
    """The PCS/FRI opening proof failed (wraps the FRI taxonomy)."""


class OodEvaluationMismatch(VerificationError):
    """C_fold(zeta)/Z_H(zeta) != Q(zeta) (verifier.rs:197)."""


def verify(
    config: StarkConfig,
    air: BaseAir,
    proof: Proof,
    public_values,
):
    F, E, pcs = config.F, config.E, config.pcs
    if getattr(pcs, "ZK", False):
        from .zk import verify_zk

        return verify_zk(config, air, proof, public_values)
    log_n = proof.degree_bits
    log_max = getattr(pcs, "log_max_lde_height", None)
    log_max = log_max() if log_max else F.TWO_ADICITY
    if log_n > log_max - pcs.fri.log_blowup:
        raise InvalidProofShape("InvalidProofShape: degree too large")
    n = 1 << log_n

    log_num_chunks = get_log_num_quotient_chunks(air)
    num_chunks = 1 << log_num_chunks

    ov = proof.opened_values
    uses_next = air.main_next_row_columns() != []
    if (
        len(ov.trace_local) != air.width
        or (uses_next and (
            ov.trace_next is None or len(ov.trace_next) != air.width
        ))
        or (not uses_next and ov.trace_next is not None)
        or len(ov.quotient_chunks) != num_chunks
        or any(len(ch) != E.D for ch in ov.quotient_chunks)
    ):
        raise InvalidProofShape("InvalidProofShape: opened value shapes")

    trace_domain = pcs.natural_domain_for_degree(n)
    quotient_domain = trace_domain.create_disjoint_domain(
        1 << (log_n + log_num_chunks)
    )
    chunk_domains = quotient_domain.split_domains(num_chunks)

    ch = config.initialise_challenger()
    ch.observe(log_n)
    ch.observe(log_n)
    ch.observe(0)
    ch.observe_digest(proof.commitments.trace)
    ch.observe_many(public_values)
    alpha = ch.sample_ext(E.D)
    ch.observe_digest(proof.commitments.quotient_chunks)
    zeta = ch.sample_ext(E.D)
    zeta_next = trace_domain.next_point_ext(E, zeta)

    # Reject ζ on the trace domain (uni-stark/src/verifier.rs:448,
    # OodPointInDomain): the opening at ζ divides by the trace-domain
    # vanishing polynomial, which is zero exactly on the domain. Honest
    # Fiat-Shamir sampling reaches this only with probability |H|/|EF|.
    if trace_domain.vanishing_poly_at_point_ext(E, zeta) == E.zero_h():
        raise OodPointInDomain("OodPointInDomain")

    trace_claims = [(zeta, ov.trace_local)]
    if uses_next:
        trace_claims.append((zeta_next, ov.trace_next))
    coords = [(trace_domain, trace_claims)]
    quotient_coords = [
        (dom, [(zeta, vals)])
        for dom, vals in zip(chunk_domains, ov.quotient_chunks)
    ]

    from ..fri.verifier import FriError

    try:
        pcs.verify(
            [
                (proof.commitments.trace, coords),
                (proof.commitments.quotient_chunks, quotient_coords),
            ],
            proof.opening_proof,
            ch,
        )
    except FriError as e:
        raise InvalidOpeningArgument(f"InvalidOpeningArgument: {e}") from e

    # recompose Q(ζ) from chunks (verifier.rs:98)
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
            # chunk[d] is the d-th basis-coefficient polynomial of Q at ζ
            basis = [0] * E.D
            basis[d] = 1
            val = E.add_h(val, E.mul_h(c, tuple(basis)))
        quotient = E.add_h(quotient, E.mul_h(zp, val))

    # evaluate folded constraints at ζ (verify_constraints :142)
    sels = trace_domain.selectors_at_point_ext(E, zeta)
    backend = VerifierBackend(E, alpha)

    def entry(kind, j):
        if kind == "local":
            return ov.trace_local[j]
        if kind == "next":
            if ov.trace_next is None:
                # AIR declared no next-row reads; builders still
                # construct the window eagerly, so hand back zeros
                # (the declared AIR's constraints never read them)
                return E.zero_h()
            return ov.trace_next[j]
        return sels[kind]

    pcols = air.periodic_columns()

    def periodic_at_zeta(j):
        from .prover import periodic_coeffs

        col = pcols[j]
        p = len(col)
        r = (1 << log_n) // p
        z_r = E.exp_h(zeta, r)
        acc = E.zero_h()
        for c in reversed(periodic_coeffs(F, col)):
            acc = E.add_h(E.mul_h(acc, z_r), E.from_base_h(c))
        return acc

    builder = _make_builder(
        backend, air.width, air.num_public_values, entry,
        lambda j: E.from_base_h(public_values[j]),
        num_periodic=len(pcols),
        periodic_entry=periodic_at_zeta if pcols else None,
    )
    air.eval(builder)
    folded = backend.acc

    if E.mul_h(folded, sels["inv_vanishing"]) != quotient:
        raise OodEvaluationMismatch("OodEvaluationMismatch")
