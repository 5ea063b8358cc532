"""uni-stark prover (uni-stark/src/prover.rs:379 -> :24 flow, no-ZK).

Phase structure = the reference's 5 Fiat-Shamir sync points (SURVEY §3.1):
device programs between host transcript touches.

Transcript order (prover.rs:159-173,216,255,299):
  observe log_ext_degree, log_degree, preprocessed_width;
  observe trace root; [preprocessed root]; observe public values;
  alpha; quotient eval+commit; observe quotient root; zeta;
  pcs.open([(trace,[ζ,ζ·g]), (quotient chunks, [ζ]×k)]).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..air.api import (
    BaseAir,
    _make_builder,
    get_log_num_quotient_chunks,
    get_symbolic_layout,
)
from ..air.builder import ProverBackend
from ..utils.bits import log2_strict
from .config import StarkConfig
from .proof import Commitments, OpenedValues, Proof


def quotient_values(
    config: StarkConfig,
    air: BaseAir,
    public_values,
    trace_domain,
    quotient_domain,
    trace_on_quotient_domain,  # (Nq, w) device, natural order
    alpha_host,
):
    """Evaluate C(T(x), T(hx), sels(x))/Z_H(x) over the whole quotient
    domain in one vectorized pass (prover.rs:399-555; the packing width is
    the entire domain)."""
    F, E = config.F, config.E
    Nq = quotient_domain.size
    sels = trace_domain.selectors_on_coset_device(quotient_domain)
    next_step = Nq // trace_domain.size

    num_constraints, _ = get_symbolic_layout(air)
    backend = ProverBackend(F, E, alpha_host, num_constraints)

    local = trace_on_quotient_domain
    nxt = jnp.roll(trace_on_quotient_domain, -next_step, axis=0)

    def entry(kind, j):
        if kind == "local":
            return local[:, j]
        if kind == "next":
            return nxt[:, j]
        return sels[kind]

    builder = _make_builder(
        backend, air.width, air.num_public_values, entry,
        lambda j: F.const(public_values[j]),
    )
    air.eval(builder)
    folded = backend.finalize((Nq,))  # (Nq, D)
    return E.base_mul(sels["inv_vanishing"], folded)


def prove(
    config: StarkConfig,
    air: BaseAir,
    trace,  # (n, width) device uint32 Monty, natural row order
    public_values,  # list[int] standard form
) -> Proof:
    F, E, pcs = config.F, config.E, config.pcs
    n = trace.shape[0]
    log_n = log2_strict(n)

    log_num_chunks = get_log_num_quotient_chunks(air)
    num_chunks = 1 << log_num_chunks

    trace_domain = pcs.natural_domain_for_degree(n)
    trace_data = pcs.commit([(trace_domain, trace)])

    ch = config.initialise_challenger()
    ch.observe(log_n)  # log_ext_degree (== log_n without ZK)
    ch.observe(log_n)
    ch.observe(0)  # preprocessed width
    ch.observe_many(trace_data.root_std)
    ch.observe_many(public_values)

    alpha = ch.sample_ext(E.D)

    quotient_domain = trace_domain.create_disjoint_domain(
        1 << (log_n + log_num_chunks)
    )
    trace_on_qd = pcs.get_evaluations_on_domain(
        trace_data, 0, quotient_domain
    )
    q_vals = quotient_values(
        config, air, public_values, trace_domain, quotient_domain,
        trace_on_qd, alpha,
    )  # (Nq, D)

    # flatten ext -> base columns, split into chunks, commit
    # (prover.rs:235-255, univariate.rs:98 commit_quotient)
    q_flat = q_vals.reshape(quotient_domain.size, E.D)
    sub_evals = quotient_domain.split_evals(num_chunks, q_flat)
    sub_domains = quotient_domain.split_domains(num_chunks)
    quotient_data = pcs.commit(list(zip(sub_domains, sub_evals)))
    ch.observe_many(quotient_data.root_std)

    zeta = ch.sample_ext(E.D)
    zeta_next = trace_domain.next_point_ext(E, zeta)

    opened, fri_proof = pcs.open(
        [
            (trace_data, [[zeta, zeta_next]]),
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
            trace_local=opened[0][0][0],
            trace_next=opened[0][0][1],
            quotient_chunks=[opened[1][i][0] for i in range(num_chunks)],
        ),
        opening_proof=fri_proof,
        degree_bits=log_n,
    )
