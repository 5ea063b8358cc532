"""Convert between our BatchRefProof and the reference batch wire form
(batch-stark/src/proof.rs layout; monty-form u32 values on the wire)."""

from __future__ import annotations

from ..fri.proof import BatchMultiOpening, CommitPhaseStep, FriProof
from ..serde.proof_codec import (
    WireBatchMultiOpening,
    WireBatchProof,
    WireCommitPhaseStep,
    WireFriProof,
    WireInstanceOpened,
    WireSpec,
    decode_batch_proof,
    encode_batch_proof,
)
from ..stark.batch_ref import BatchRefOpened, BatchRefProof


def _cap_to_wire(commitment, digest):
    """Our commitment (root tuple | cap tuple-of-tuples) -> wire cap."""
    if commitment and isinstance(commitment[0], (tuple, list)):
        return [digest(d) for d in commitment]
    return [digest(commitment)]


def _cap_from_wire(cap, digest):
    if len(cap) == 1:
        return digest(cap[0])
    return tuple(digest(d) for d in cap)


def fri_to_wire(fp: FriProof, F) -> WireFriProof:
    m = F.to_monty_h

    def ext(e):
        return tuple(m(int(c)) for c in e)

    def digest(d):
        return tuple(m(int(c)) for c in d)

    return WireFriProof(
        commit_phase_commits=[
            _cap_to_wire(c, digest) for c in fp.commit_phase_commits
        ],
        commit_pow_witnesses=[m(int(w)) for w in fp.commit_pow_witnesses],
        input_openings=[
            WireBatchMultiOpening(
                opened_values=[
                    [[m(int(v)) for v in row] for row in q]
                    for q in b.opened_values
                ],
                sibling_hashes=[digest(d) for d in b.opening_proof],
            )
            for b in fp.input_openings
        ],
        commit_phase_openings=[
            WireCommitPhaseStep(
                log_arity=s.log_arity,
                sibling_values=[
                    [ext(v) for v in q] for q in s.sibling_values
                ],
                sibling_hashes=[digest(d) for d in s.opening_proof],
            )
            for s in fp.commit_phase_steps
        ],
        final_poly=[ext(c) for c in fp.final_poly],
        query_pow_witness=m(int(fp.query_pow_witness)),
    )


def wire_to_fri(wf: WireFriProof, F) -> FriProof:
    s = F.from_monty_h

    def ext(e):
        return tuple(s(int(c)) for c in e)

    def digest(d):
        return tuple(s(int(c)) for c in d)

    return FriProof(
        commit_phase_commits=[
            _cap_from_wire(c, digest) for c in wf.commit_phase_commits
        ],
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


def batch_proof_to_wire(proof: BatchRefProof, F) -> WireBatchProof:
    m = F.to_monty_h

    def ext(e):
        return tuple(m(int(c)) for c in e)

    def digest(d):
        return tuple(m(int(c)) for c in d)

    insts = [
        WireInstanceOpened(
            trace_local=[ext(t) for t in i.trace_local],
            trace_next=(
                [ext(t) for t in i.trace_next]
                if i.trace_next is not None else None
            ),
            preprocessed_local=(
                [ext(t) for t in i.preprocessed_local]
                if i.preprocessed_local is not None else None
            ),
            preprocessed_next=(
                [ext(t) for t in i.preprocessed_next]
                if i.preprocessed_next is not None else None
            ),
            quotient_chunks=[
                [ext(t) for t in ch] for ch in i.quotient_chunks
            ],
            random_values=None,
            permutation_local=[ext(t) for t in i.permutation_local],
            permutation_next=[ext(t) for t in i.permutation_next],
        )
        for i in proof.instances
    ]
    return WireBatchProof(
        main_commit=_cap_to_wire(proof.main_commit, digest),
        permutation_commit=(
            _cap_to_wire(proof.permutation_commit, digest)
            if proof.permutation_commit is not None else None
        ),
        quotient_commit=_cap_to_wire(proof.quotient_commit, digest),
        random_commit=None,
        instances=insts,
        opening_proof=fri_to_wire(proof.opening_proof, F),
        lookup_terminals=[
            ext(t) if t is not None else None
            for t in proof.lookup_terminals
        ],
        degree_bits=proof.degree_bits,
    )


def wire_to_batch_proof(w: WireBatchProof, F) -> BatchRefProof:
    s = F.from_monty_h

    def ext(e):
        return tuple(s(int(c)) for c in e)

    def digest(d):
        return tuple(s(int(c)) for c in d)

    insts = [
        BatchRefOpened(
            trace_local=[ext(t) for t in i.trace_local],
            trace_next=(
                [ext(t) for t in i.trace_next]
                if i.trace_next is not None else None
            ),
            preprocessed_local=(
                [ext(t) for t in i.preprocessed_local]
                if i.preprocessed_local is not None else None
            ),
            preprocessed_next=(
                [ext(t) for t in i.preprocessed_next]
                if i.preprocessed_next is not None else None
            ),
            quotient_chunks=[
                [ext(t) for t in ch] for ch in i.quotient_chunks
            ],
            permutation_local=[ext(t) for t in i.permutation_local],
            permutation_next=[ext(t) for t in i.permutation_next],
        )
        for i in w.instances
    ]
    return BatchRefProof(
        main_commit=_cap_from_wire(w.main_commit, digest),
        permutation_commit=(
            _cap_from_wire(w.permutation_commit, digest)
            if w.permutation_commit is not None else None
        ),
        quotient_commit=_cap_from_wire(w.quotient_commit, digest),
        instances=insts,
        opening_proof=wire_to_fri(w.opening_proof, F),
        lookup_terminals=[
            ext(t) if t is not None else None for t in w.lookup_terminals
        ],
        degree_bits=list(w.degree_bits),
    )


def encode_batch_ref_proof(proof: BatchRefProof, F,
                           spec: WireSpec) -> bytes:
    return encode_batch_proof(batch_proof_to_wire(proof, F), spec)


def decode_to_batch_ref_proof(data: bytes, F,
                              spec: WireSpec) -> BatchRefProof:
    return wire_to_batch_proof(decode_batch_proof(data, spec), F)


# ---------------------------------------------------------------------------
# circle variant: M31 identity wire form, [u8;32] byte digests,
# CirclePcsProof opening layout (circle/src/{pcs,proof}.rs)
# ---------------------------------------------------------------------------
def _c_ext(e):
    return tuple(int(c) for c in e)


def _c_digest_w(d):
    return bytes(int(c) & 0xFF for c in d)


def _c_digest_r(d):
    return tuple(int(c) for c in d)


def _c_cap_w(commitment):
    if commitment and isinstance(commitment[0], (tuple, list)):
        return [_c_digest_w(d) for d in commitment]
    return [_c_digest_w(commitment)]


def _c_cap_r(cap):
    if len(cap) == 1:
        return _c_digest_r(cap[0])
    return tuple(_c_digest_r(d) for d in cap)


def batch_circle_proof_to_wire(proof: BatchRefProof) -> WireBatchProof:
    from ..circle_pcs.pcs import CirclePcsProof
    from ..serde.proof_codec import WireCircleInput, WireCirclePcsProof

    op = proof.opening_proof
    assert isinstance(op, CirclePcsProof)
    fp = op.fri_proof
    ci = fp.input_openings
    wire_inputs = WireCircleInput(
        input_openings=[
            WireBatchMultiOpening(
                opened_values=[
                    [[int(v) for v in row] for row in q]
                    for q in b.opened_values
                ],
                sibling_hashes=[_c_digest_w(d) for d in b.opening_proof],
            )
            for b in ci.input_openings
        ],
        first_layer_siblings=[
            [_c_ext(v) for v in q] for q in ci.first_layer_siblings
        ],
        first_layer_sibling_hashes=[
            _c_digest_w(d) for d in ci.first_layer_proofs
        ],
    )
    wire_fri = WireFriProof(
        commit_phase_commits=[
            _c_cap_w(c) for c in fp.commit_phase_commits
        ],
        commit_pow_witnesses=[int(w) for w in fp.commit_pow_witnesses],
        input_openings=wire_inputs,
        commit_phase_openings=[
            WireCommitPhaseStep(
                log_arity=s.log_arity,
                sibling_values=[
                    [_c_ext(v) for v in q] for q in s.sibling_values
                ],
                sibling_hashes=[_c_digest_w(d) for d in s.opening_proof],
            )
            for s in fp.commit_phase_steps
        ],
        final_poly=_c_ext(fp.final_poly[0]),
        query_pow_witness=int(fp.query_pow_witness),
    )
    insts = [
        WireInstanceOpened(
            trace_local=[_c_ext(t) for t in i.trace_local],
            trace_next=(
                [_c_ext(t) for t in i.trace_next]
                if i.trace_next is not None else None
            ),
            preprocessed_local=(
                [_c_ext(t) for t in i.preprocessed_local]
                if i.preprocessed_local is not None else None
            ),
            preprocessed_next=(
                [_c_ext(t) for t in i.preprocessed_next]
                if i.preprocessed_next is not None else None
            ),
            quotient_chunks=[
                [_c_ext(t) for t in ch] for ch in i.quotient_chunks
            ],
            random_values=None,
            permutation_local=[_c_ext(t) for t in i.permutation_local],
            permutation_next=[_c_ext(t) for t in i.permutation_next],
        )
        for i in proof.instances
    ]
    return WireBatchProof(
        main_commit=_c_cap_w(proof.main_commit),
        permutation_commit=(
            _c_cap_w(proof.permutation_commit)
            if proof.permutation_commit is not None else None
        ),
        quotient_commit=_c_cap_w(proof.quotient_commit),
        random_commit=None,
        instances=insts,
        opening_proof=WireCirclePcsProof(
            first_layer_commitment=_c_cap_w(op.first_layer_commitment),
            lambdas=[_c_ext(l) for l in op.lambdas],
            fri=wire_fri,
        ),
        lookup_terminals=[
            _c_ext(t) if t is not None else None
            for t in proof.lookup_terminals
        ],
        degree_bits=proof.degree_bits,
    )


def wire_to_batch_circle_proof(w: WireBatchProof) -> BatchRefProof:
    from ..circle_pcs.pcs import CircleInputProof, CirclePcsProof

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
                opening_proof=[_c_digest_r(d) for d in b.sibling_hashes],
            )
            for b in ci.input_openings
        ],
        first_layer_siblings=[
            [_c_ext(v) for v in q] for q in ci.first_layer_siblings
        ],
        first_layer_proofs=[
            _c_digest_r(d) for d in ci.first_layer_sibling_hashes
        ],
    )
    fri = FriProof(
        commit_phase_commits=[
            _c_cap_r(c) for c in wf.commit_phase_commits
        ],
        commit_pow_witnesses=[int(x) for x in wf.commit_pow_witnesses],
        input_openings=inputs,
        commit_phase_steps=[
            CommitPhaseStep(
                log_arity=st.log_arity,
                sibling_values=[
                    [_c_ext(v) for v in q] for q in st.sibling_values
                ],
                opening_proof=[_c_digest_r(d) for d in st.sibling_hashes],
            )
            for st in wf.commit_phase_openings
        ],
        final_poly=[_c_ext(wf.final_poly)],
        query_pow_witness=int(wf.query_pow_witness),
    )
    op = CirclePcsProof(
        first_layer_commitment=_c_cap_r(wop.first_layer_commitment),
        lambdas=[_c_ext(l) for l in wop.lambdas],
        fri_proof=fri,
    )
    insts = [
        BatchRefOpened(
            trace_local=[_c_ext(t) for t in i.trace_local],
            trace_next=(
                [_c_ext(t) for t in i.trace_next]
                if i.trace_next is not None else None
            ),
            preprocessed_local=(
                [_c_ext(t) for t in i.preprocessed_local]
                if i.preprocessed_local is not None else None
            ),
            preprocessed_next=(
                [_c_ext(t) for t in i.preprocessed_next]
                if i.preprocessed_next is not None else None
            ),
            quotient_chunks=[
                [_c_ext(t) for t in ch] for ch in i.quotient_chunks
            ],
            permutation_local=[_c_ext(t) for t in i.permutation_local],
            permutation_next=[_c_ext(t) for t in i.permutation_next],
        )
        for i in w.instances
    ]
    return BatchRefProof(
        main_commit=_c_cap_r(w.main_commit),
        permutation_commit=(
            _c_cap_r(w.permutation_commit)
            if w.permutation_commit is not None else None
        ),
        quotient_commit=_c_cap_r(w.quotient_commit),
        instances=insts,
        opening_proof=op,
        lookup_terminals=[
            _c_ext(t) if t is not None else None
            for t in w.lookup_terminals
        ],
        degree_bits=list(w.degree_bits),
    )
