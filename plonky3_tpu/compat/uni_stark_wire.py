"""Convert between our uni-stark Proof objects and the reference wire form.

Wire values are Monty-form u32 (monty-31 serde, `monty_31.rs:167-184`);
our proof objects hold standard-form ints. Commitments on the wire are
MerkleCaps (cap height 0 in the fixture configs → a single digest).
"""

from __future__ import annotations

from ..fri.proof import BatchMultiOpening, CommitPhaseStep, FriProof
from ..serde.proof_codec import (
    WireBatchMultiOpening,
    WireCommitPhaseStep,
    WireFriProof,
    WireProof,
    WireSpec,
    decode_proof,
    encode_proof,
)
from ..stark.proof import Commitments, OpenedValues, Proof


def _to_wire_builder(F):
    m = F.to_monty_h

    def ext(e):
        return tuple(m(int(c)) for c in e)

    def digest(d):
        return tuple(m(int(c)) for c in d)

    return m, ext, digest


def proof_to_wire(proof: Proof, F) -> WireProof:
    m, ext, digest = _to_wire_builder(F)
    fp = proof.opening_proof
    wire_inputs = [
        WireBatchMultiOpening(
            opened_values=[
                [[m(int(v)) for v in row] for row in q]
                for q in b.opened_values
            ],
            sibling_hashes=[digest(d) for d in b.opening_proof],
        )
        for b in fp.input_openings
    ]
    wire_fri = WireFriProof(
        commit_phase_commits=[[digest(c)] for c in fp.commit_phase_commits],
        commit_pow_witnesses=[m(int(w)) for w in fp.commit_pow_witnesses],
        input_openings=wire_inputs,
        commit_phase_openings=[
            WireCommitPhaseStep(
                log_arity=s.log_arity,
                sibling_values=[[ext(v) for v in q] for q in s.sibling_values],
                sibling_hashes=[digest(d) for d in s.opening_proof],
            )
            for s in fp.commit_phase_steps
        ],
        final_poly=[ext(c) for c in fp.final_poly],
        query_pow_witness=m(int(fp.query_pow_witness)),
    )
    ov = proof.opened_values
    return WireProof(
        trace_commit=[digest(proof.commitments.trace)],
        quotient_commit=[digest(proof.commitments.quotient_chunks)],
        random_commit=None,
        trace_local=[ext(t) for t in ov.trace_local],
        trace_next=[ext(t) for t in ov.trace_next],
        preprocessed_local=None,
        preprocessed_next=None,
        quotient_chunks=[[ext(t) for t in ch] for ch in ov.quotient_chunks],
        random_values=None,
        opening_proof=wire_fri,
        degree_bits=proof.degree_bits,
    )


def wire_to_proof(w: WireProof, F) -> Proof:
    s = F.from_monty_h

    def ext(e):
        return tuple(s(int(c)) for c in e)

    def digest(d):
        return tuple(s(int(c)) for c in d)

    wf = w.opening_proof
    fri = FriProof(
        commit_phase_commits=[digest(c[0]) for c in wf.commit_phase_commits],
        commit_pow_witnesses=[s(int(x)) for x in wf.commit_pow_witnesses],
        input_openings=[
            BatchMultiOpening(
                opened_values=[
                    [[s(int(v)) for v in row] for row in q]
                    for q in b.opened_values
                ],
                opening_proof=[digest(d) for d in b.sibling_hashes],
            )
            for b in wf.input_openings
        ],
        commit_phase_steps=[
            CommitPhaseStep(
                log_arity=st.log_arity,
                sibling_values=[
                    [ext(v) for v in q] for q in st.sibling_values
                ],
                opening_proof=[digest(d) for d in st.sibling_hashes],
            )
            for st in wf.commit_phase_openings
        ],
        final_poly=[ext(c) for c in wf.final_poly],
        query_pow_witness=s(int(wf.query_pow_witness)),
    )
    return Proof(
        commitments=Commitments(
            trace=digest(w.trace_commit[0]),
            quotient_chunks=digest(w.quotient_commit[0]),
        ),
        opened_values=OpenedValues(
            trace_local=[ext(t) for t in w.trace_local],
            trace_next=[ext(t) for t in (w.trace_next or [])],
            quotient_chunks=[
                [ext(t) for t in ch] for ch in w.quotient_chunks
            ],
        ),
        opening_proof=fri,
        degree_bits=w.degree_bits,
    )


def encode_our_proof(proof: Proof, F, spec: WireSpec) -> bytes:
    return encode_proof(proof_to_wire(proof, F), spec)


def decode_to_our_proof(data: bytes, F, spec: WireSpec) -> Proof:
    return wire_to_proof(decode_proof(data, spec), F)


# ----------------------------------------------------------------------
# Circle config (M31 canonical wire form; [u8;32] keccak digests;
# CirclePcsProof layout per circle/src/{pcs,proof}.rs)
# ----------------------------------------------------------------------
def circle_proof_to_wire(proof) -> WireProof:
    from ..circle_pcs.pcs import CirclePcsProof
    from ..serde.proof_codec import WireCircleInput, WireCirclePcsProof

    def ext(e):
        return tuple(int(c) for c in e)

    def digest(d):
        return bytes(int(c) & 0xFF for c in d)

    op = proof.opening_proof
    assert isinstance(op, CirclePcsProof)
    fp = op.fri_proof
    ci = fp.input_openings  # CircleInputProof
    wire_inputs = WireCircleInput(
        input_openings=[
            WireBatchMultiOpening(
                opened_values=[
                    [[int(v) for v in row] for row in q]
                    for q in b.opened_values
                ],
                sibling_hashes=[digest(d) for d in b.opening_proof],
            )
            for b in ci.input_openings
        ],
        first_layer_siblings=[
            [ext(v) for v in q] for q in ci.first_layer_siblings
        ],
        first_layer_sibling_hashes=[
            digest(d) for d in ci.first_layer_proofs
        ],
    )
    wire_fri = WireFriProof(
        commit_phase_commits=[[digest(c)] for c in fp.commit_phase_commits],
        commit_pow_witnesses=[int(w) for w in fp.commit_pow_witnesses],
        input_openings=wire_inputs,
        commit_phase_openings=[
            WireCommitPhaseStep(
                log_arity=s.log_arity,
                sibling_values=[[ext(v) for v in q] for q in s.sibling_values],
                sibling_hashes=[digest(d) for d in s.opening_proof],
            )
            for s in fp.commit_phase_steps
        ],
        final_poly=ext(fp.final_poly[0]),
        query_pow_witness=int(fp.query_pow_witness),
    )
    ov = proof.opened_values
    return WireProof(
        trace_commit=[digest(proof.commitments.trace)],
        quotient_commit=[digest(proof.commitments.quotient_chunks)],
        random_commit=None,
        trace_local=[ext(t) for t in ov.trace_local],
        trace_next=[ext(t) for t in ov.trace_next],
        preprocessed_local=None,
        preprocessed_next=None,
        quotient_chunks=[[ext(t) for t in ch] for ch in ov.quotient_chunks],
        random_values=None,
        opening_proof=WireCirclePcsProof(
            first_layer_commitment=[digest(op.first_layer_commitment)],
            lambdas=[ext(l) for l in op.lambdas],
            fri=wire_fri,
        ),
        degree_bits=proof.degree_bits,
    )


def circle_wire_to_proof(w: WireProof):
    from ..circle_pcs.pcs import CircleInputProof, CirclePcsProof

    def ext(e):
        return tuple(int(c) for c in e)

    def digest(d):
        return tuple(int(c) for c in d)

    wop = w.opening_proof
    wf = wop.fri
    ci = wf.input_openings
    inputs = CircleInputProof(
        input_openings=[
            BatchMultiOpening(
                opened_values=[
                    [[int(v) for v in row] for row in q]
                    for q in b.opened_values
                ],
                opening_proof=[digest(d) for d in b.sibling_hashes],
            )
            for b in ci.input_openings
        ],
        first_layer_siblings=[
            [ext(v) for v in q] for q in ci.first_layer_siblings
        ],
        first_layer_proofs=[
            digest(d) for d in ci.first_layer_sibling_hashes
        ],
    )
    fri = FriProof(
        commit_phase_commits=[digest(c[0]) for c in wf.commit_phase_commits],
        commit_pow_witnesses=[int(x) for x in wf.commit_pow_witnesses],
        input_openings=inputs,
        commit_phase_steps=[
            CommitPhaseStep(
                log_arity=st.log_arity,
                sibling_values=[
                    [ext(v) for v in q] for q in st.sibling_values
                ],
                opening_proof=[digest(d) for d in st.sibling_hashes],
            )
            for st in wf.commit_phase_openings
        ],
        final_poly=[ext(wf.final_poly)],
        query_pow_witness=int(wf.query_pow_witness),
    )
    return Proof(
        commitments=Commitments(
            trace=digest(w.trace_commit[0]),
            quotient_chunks=digest(w.quotient_commit[0]),
        ),
        opened_values=OpenedValues(
            trace_local=[ext(t) for t in w.trace_local],
            trace_next=[ext(t) for t in (w.trace_next or [])],
            quotient_chunks=[
                [ext(t) for t in ch] for ch in w.quotient_chunks
            ],
        ),
        opening_proof=CirclePcsProof(
            first_layer_commitment=digest(wop.first_layer_commitment[0]),
            lambdas=[ext(l) for l in wop.lambdas],
            fri_proof=fri,
        ),
        degree_bits=w.degree_bits,
    )
