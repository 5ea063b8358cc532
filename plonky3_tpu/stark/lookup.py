"""LogUp lookup argument (the `lookup` crate core) over uni-stark.

Log-derivative form (lookup/src/logup.rs:1-18):

    Σ_i m_i/(β - a_i)  =  Σ_j m'_j/(β - b_j)

realized as a running-sum auxiliary column s over the extension field:

    s_first = 0
    s_next - s = term(row)            (transition)
    s_last + term(last) = 0           (terminal balance)

with term = m_a/(β - a) - m_b/(β - b). The auxiliary trace commits in a
SECOND commitment after β is sampled from the main commitment (logup
soundness ordering). Constraints are kept polynomial by multiplying
through the denominators:

    (s_next - s)·(β-a)·(β-b) - m_a·(β-b) + m_b·(β-a) = 0

Extension arithmetic inside the constraint DSL is expressed over the D
flattened base columns of s (ext ops as explicit bilinear column
formulas), so the whole composite is a plain base-field AIR and the
generic uni-stark prover/verifier machinery applies unchanged.

v1 scope: one lookup per proof, single-column send/recv with
multiplicity columns (a, m_a, b, m_b given by column indices); the full
bus/interaction builder (lookup/src/{bus,builder}.rs) is round-2 work.
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
from ..utils.bits import log2_strict
from .config import StarkConfig
from .proof import Commitments, OpenedValues, Proof
from .prover import quotient_values
from .verifier import VerificationError


@dataclass(frozen=True)
class LookupColumns:
    """Column indices in the main trace: send value/multiplicity and
    receive (table) value/multiplicity."""

    a: int
    m_a: int
    b: int
    m_b: int


def _ext_mul_syms(E, x, y):
    """Ext product over lists of D Syms (binomial X^D - W algebra)."""
    D, W = E.D, E.W
    out = [None] * D
    for i in range(D):
        for j in range(D):
            prod = x[i] * y[j]
            k = i + j
            if k >= D:
                k -= D
                prod = prod * W
            out[k] = prod if out[k] is None else out[k] + prod
    return out


class LogUpAir(BaseAir):
    """Composite AIR: inner constraints + the LogUp running sum.

    Trace layout: [main (inner.width) | s (D columns)].
    Public values: inner publics ++ β (D components).
    """

    def __init__(self, inner: BaseAir, cols: LookupColumns, E):
        self.inner = inner
        self.cols = cols
        self.E = E
        self.field = inner.field
        self.width = inner.width + E.D
        self.num_public_values = inner.num_public_values + E.D

    def eval(self, b):
        inner_w = self.inner.width
        D = self.E.D

        # inner AIR over its own columns/publics (shared builder state)
        inner_builder = type(b)(
            b.backend,
            type(b.main)(
                local=b.main.local[:inner_w], next=b.main.next[:inner_w]
            ),
            b.public_values[: self.inner.num_public_values],
            b.is_first_row, b.is_last_row, b.is_transition,
        )
        self.inner.eval(inner_builder)

        beta = b.public_values[self.inner.num_public_values :]
        s = b.main.local[inner_w:]
        s_next = b.main.next[inner_w:]
        c = self.cols
        a = b.main.local[c.a]
        m_a = b.main.local[c.m_a]
        bb = b.main.local[c.b]
        m_b = b.main.local[c.m_b]

        # β - a and β - b as ext column lists (base value in component 0)
        beta_minus_a = [beta[0] - a] + [beta[k] for k in range(1, D)]
        beta_minus_b = [beta[0] - bb] + [beta[k] for k in range(1, D)]
        prod_den = _ext_mul_syms(self.E, beta_minus_a, beta_minus_b)

        def term_expr(diff):
            """(diff)·(β-a)(β-b) - m_a·(β-b) + m_b·(β-a), diff ext Syms."""
            lhs = _ext_mul_syms(self.E, diff, prod_den)
            return [
                lhs[k] - m_a * beta_minus_b[k] + m_b * beta_minus_a[k]
                for k in range(D)
            ]

        # s_first = 0
        first = b.when_first_row()
        for k in range(D):
            first.assert_zero(s[k])
        # transition: (s_next - s) balanced against term(row)
        diff_t = [s_next[k] - s[k] for k in range(D)]
        trans = b.when_transition()
        for e in term_expr(diff_t):
            trans.assert_zero(e)
        # last row: (0 - s) - term(last) = 0  => terminal balance
        diff_l = [-s[k] for k in range(D)]
        last = b.when_last_row()
        for e in term_expr(diff_l):
            last.assert_zero(e)


def build_permutation_trace(E, trace_std: np.ndarray, cols: LookupColumns,
                            beta) -> np.ndarray:
    """(n, D) running-sum columns (host exact; n is small relative to the
    device phases — the reference generates this trace on the CPU side
    too before committing)."""
    n = trace_std.shape[0]
    s = E.zero_h()
    out = np.zeros((n, E.D), dtype=np.uint32)
    for i in range(n):
        out[i] = s
        a = int(trace_std[i, cols.a])
        m_a = int(trace_std[i, cols.m_a])
        b_ = int(trace_std[i, cols.b])
        m_b = int(trace_std[i, cols.m_b])
        t_a = E.base_mul_h(
            m_a, E.inv_h(E.sub_h(beta, E.from_base_h(a)))
        )
        t_b = E.base_mul_h(
            m_b, E.inv_h(E.sub_h(beta, E.from_base_h(b_)))
        )
        s = E.add_h(s, E.sub_h(t_a, t_b))
    if s != E.zero_h():
        raise ValueError("unbalanced lookup: terminal != 0")
    return out


def prove_with_lookup(config: StarkConfig, air: BaseAir, trace,
                      public_values, cols: LookupColumns) -> Proof:
    """uni-stark prove with one LogUp lookup: main commit -> β -> perm
    commit -> α -> quotient over the composite AIR -> shared open."""
    F, E, pcs = config.F, config.E, config.pcs
    n = trace.shape[0]
    log_n = log2_strict(n)

    trace_domain = pcs.natural_domain_for_degree(n)
    main_data = pcs.commit([(trace_domain, trace)])

    ch = config.initialise_challenger()
    ch.observe(log_n)
    ch.observe(log_n)
    ch.observe(0)
    ch.observe_digest(main_data.root_std)
    ch.observe_many(public_values)
    beta = ch.sample_ext(E.D)

    trace_std = F.from_monty_np(np.asarray(trace))
    perm_std = build_permutation_trace(E, trace_std, cols, beta)
    perm_dev = jnp.asarray(F.to_monty_np(perm_std))
    perm_data = pcs.commit([(trace_domain, perm_dev)])
    ch.observe_digest(perm_data.root_std)

    alpha = ch.sample_ext(E.D)

    lair = LogUpAir(air, cols, E)
    publics_all = list(public_values) + list(beta)
    log_num_chunks = get_log_num_quotient_chunks(lair)
    num_chunks = 1 << log_num_chunks
    qd = trace_domain.create_disjoint_domain(1 << (log_n + log_num_chunks))
    main_on_qd = pcs.get_evaluations_on_domain(main_data, 0, qd)
    perm_on_qd = pcs.get_evaluations_on_domain(perm_data, 0, qd)
    both = jnp.concatenate([main_on_qd, perm_on_qd], axis=1)
    n_cons, _ = get_symbolic_layout(lair)
    alpha_pows = E.powers_np(alpha, n_cons)[::-1].copy()
    publics_m = jnp.asarray(
        F.to_monty_np(np.asarray(publics_all, dtype=np.uint32))
    )
    q = quotient_values(
        config, lair, trace_domain, qd, both, publics_m,
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
            (main_data, [[zeta, zeta_next]]),
            (perm_data, [[zeta, zeta_next]]),
            (quotient_data, [[zeta]] * num_chunks),
        ],
        ch,
    )
    return Proof(
        commitments=Commitments(
            trace=main_data.root_std,
            quotient_chunks=quotient_data.root_std,
        ),
        opened_values=OpenedValues(
            trace_local=opened[0][0][0] + opened[1][0][0],
            trace_next=opened[0][0][1] + opened[1][0][1],
            quotient_chunks=[opened[2][i][0] for i in range(num_chunks)],
        ),
        opening_proof=fri_proof,
        degree_bits=log_n,
    ), perm_data.root_std


def verify_with_lookup(config: StarkConfig, air: BaseAir, proof: Proof,
                       perm_root, public_values, cols: LookupColumns):
    from ..air.builder import VerifierBackend
    from ..fri.verifier import FriError

    F, E, pcs = config.F, config.E, config.pcs
    log_n = proof.degree_bits
    n = 1 << log_n
    lair = LogUpAir(air, cols, E)
    num_chunks = 1 << get_log_num_quotient_chunks(lair)

    ov = proof.opened_values
    if len(ov.trace_local) != lair.width or len(
        ov.trace_next
    ) != lair.width:
        raise VerificationError("InvalidProofShape")

    trace_domain = pcs.natural_domain_for_degree(n)
    qd = trace_domain.create_disjoint_domain(num_chunks << log_n)
    chunk_domains = qd.split_domains(num_chunks)

    ch = config.initialise_challenger()
    ch.observe(log_n)
    ch.observe(log_n)
    ch.observe(0)
    ch.observe_digest(proof.commitments.trace)
    ch.observe_many(public_values)
    beta = ch.sample_ext(E.D)
    ch.observe_digest(perm_root)
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
    coords_perm = [
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
                (perm_root, coords_perm),
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
    publics_all = list(public_values) + list(beta)

    def entry(kind, j):
        if kind == "local":
            return ov.trace_local[j]
        if kind == "next":
            return ov.trace_next[j]
        return sels[kind]

    builder = _make_builder(
        backend, lair.width, lair.num_public_values, entry,
        lambda j: E.from_base_h(publics_all[j]),
    )
    lair.eval(builder)
    if E.mul_h(backend.acc, sels["inv_vanishing"]) != quotient:
        raise VerificationError("OodEvaluationMismatch")
