"""Preprocessed (fixed) traces for uni-stark.

Mirrors `uni-stark/src/preprocessed.rs` + `prover.rs:24-72`
(prove_with_preprocessed): a one-time `setup_preprocessed` commits the
AIR's fixed columns; each proof opens them at (ζ, ζ·g) alongside the
main trace. AIRs expose fixed columns via `preprocessed_trace()` (numpy
standard form) and read them in `eval` through `builder.preprocessed`
(a RowWindow, air/src/air.rs:28-45 semantics).

Internally the composite is evaluated as a widened AIR over
[main | preprocessed] columns so the generic quotient/verifier machinery
applies unchanged (same wrapper pattern as stark/lookup.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..air.api import (
    BaseAir,
    _make_builder,
    get_log_num_quotient_chunks,
    get_symbolic_layout,
)
from ..air.builder import RowWindow
from ..utils.bits import log2_strict
from .config import StarkConfig
from .proof import Commitments, OpenedValues, Proof
from .prover import quotient_values
from .verifier import VerificationError


class _WithPreprocessed(BaseAir):
    """Widened AIR over [main | preprocessed] columns."""

    def __init__(self, inner: BaseAir, pre_width: int):
        self.inner = inner
        self.pre_width = pre_width
        self.field = inner.field
        self.width = inner.width + pre_width
        self.num_public_values = inner.num_public_values

    def eval(self, b):
        mw = self.inner.width
        child = type(b)(
            b.backend,
            type(b.main)(local=b.main.local[:mw], next=b.main.next[:mw]),
            b.public_values,
            b.is_first_row, b.is_last_row, b.is_transition,
        )
        child.preprocessed = RowWindow(
            local=b.main.local[mw:], next=b.main.next[mw:]
        )
        self.inner.eval(child)


@dataclass
class PreprocessedData:
    data: object  # pcs prover data
    root: tuple
    width: int


def setup_preprocessed(config: StarkConfig, air: BaseAir,
                       log_n: int) -> PreprocessedData:
    """One-time commitment to the AIR's fixed columns at height 2^log_n."""
    pcs, F = config.pcs, config.F
    pre = air.preprocessed_trace(log_n)
    assert pre is not None and pre.shape[0] == 1 << log_n
    dom = pcs.natural_domain_for_degree(1 << log_n)
    data = pcs.commit([(dom, jnp.asarray(F.to_monty_np(pre)))])
    return PreprocessedData(
        data=data, root=data.root_std, width=pre.shape[1]
    )


def prove_with_preprocessed(config: StarkConfig, air: BaseAir, trace,
                            public_values,
                            pre: PreprocessedData) -> Proof:
    F, E, pcs = config.F, config.E, config.pcs
    n = trace.shape[0]
    log_n = log2_strict(n)

    comp = _WithPreprocessed(air, pre.width)
    log_num_chunks = get_log_num_quotient_chunks(comp)
    num_chunks = 1 << log_num_chunks

    trace_domain = pcs.natural_domain_for_degree(n)
    trace_data = pcs.commit([(trace_domain, trace)])

    ch = config.initialise_challenger()
    ch.observe(log_n)
    ch.observe(log_n)
    ch.observe(pre.width)
    ch.observe_digest(trace_data.root_std)
    ch.observe_digest(pre.root)
    ch.observe_many(public_values)
    alpha = ch.sample_ext(E.D)

    qd = trace_domain.create_disjoint_domain(num_chunks << log_n)
    main_on_qd = pcs.get_evaluations_on_domain(trace_data, 0, qd)
    pre_on_qd = pcs.get_evaluations_on_domain(pre.data, 0, qd)
    both = jnp.concatenate([main_on_qd, pre_on_qd], axis=1)
    n_cons, _ = get_symbolic_layout(comp)
    alpha_pows = E.powers_np(alpha, n_cons)[::-1].copy()
    publics_m = (
        jnp.asarray(
            F.to_monty_np(np.asarray(public_values, dtype=np.uint32))
        )
        if public_values
        else jnp.zeros((0,), jnp.uint32)
    )
    q = quotient_values(
        config, comp, trace_domain, qd, both, publics_m,
        jnp.asarray(alpha_pows),
    )
    q_flat = q.reshape(qd.size, E.D)
    quotient_data = pcs.commit(
        list(zip(qd.split_domains(num_chunks),
                 qd.split_evals(num_chunks, q_flat)))
    )
    ch.observe_digest(quotient_data.root_std)

    zeta = ch.sample_ext(E.D)
    zeta_next = trace_domain.next_point_ext(E, zeta)
    opened, fri_proof = pcs.open(
        [
            (trace_data, [[zeta, zeta_next]]),
            (pre.data, [[zeta, zeta_next]]),
            (quotient_data, [[zeta]] * num_chunks),
        ],
        ch,
    )
    return Proof(
        commitments=Commitments(
            trace=trace_data.root_std,
            quotient_chunks=quotient_data.root_std,
        ),
        opened_values=OpenedValues(
            trace_local=opened[0][0][0] + opened[1][0][0],
            trace_next=opened[0][0][1] + opened[1][0][1],
            quotient_chunks=[opened[2][i][0] for i in range(num_chunks)],
        ),
        opening_proof=fri_proof,
        degree_bits=log_n,
    )


def verify_with_preprocessed(config: StarkConfig, air: BaseAir,
                             proof: Proof, public_values, pre_root,
                             pre_width: int):
    from ..air.builder import VerifierBackend
    from ..fri.verifier import FriError

    F, E, pcs = config.F, config.E, config.pcs
    log_n = proof.degree_bits
    n = 1 << log_n
    comp = _WithPreprocessed(air, pre_width)
    num_chunks = 1 << get_log_num_quotient_chunks(comp)

    ov = proof.opened_values
    if len(ov.trace_local) != comp.width or len(
        ov.trace_next
    ) != comp.width:
        raise VerificationError("InvalidProofShape")

    trace_domain = pcs.natural_domain_for_degree(n)
    qd = trace_domain.create_disjoint_domain(num_chunks << log_n)
    chunk_domains = qd.split_domains(num_chunks)

    ch = config.initialise_challenger()
    ch.observe(log_n)
    ch.observe(log_n)
    ch.observe(pre_width)
    ch.observe_digest(proof.commitments.trace)
    ch.observe_digest(pre_root)
    ch.observe_many(public_values)
    alpha = ch.sample_ext(E.D)
    ch.observe_digest(proof.commitments.quotient_chunks)
    zeta = ch.sample_ext(E.D)
    zeta_next = trace_domain.next_point_ext(E, zeta)

    mw = air.width
    coords_main = [
        (trace_domain, [
            (zeta, ov.trace_local[:mw]), (zeta_next, ov.trace_next[:mw])
        ])
    ]
    coords_pre = [
        (trace_domain, [
            (zeta, ov.trace_local[mw:]), (zeta_next, ov.trace_next[mw:])
        ])
    ]
    quotient_coords = [
        (dom, [(zeta, vals)])
        for dom, vals in zip(chunk_domains, ov.quotient_chunks)
    ]
    try:
        pcs.verify(
            [
                (proof.commitments.trace, coords_main),
                (pre_root, coords_pre),
                (proof.commitments.quotient_chunks, quotient_coords),
            ],
            proof.opening_proof,
            ch,
        )
    except FriError as e:
        raise VerificationError(f"InvalidOpeningArgument: {e}") from e

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
        backend, comp.width, comp.num_public_values, entry,
        lambda j: E.from_base_h(public_values[j]),
    )
    comp.eval(builder)
    if E.mul_h(backend.acc, sels["inv_vanishing"]) != quotient:
        raise VerificationError("OodEvaluationMismatch")
