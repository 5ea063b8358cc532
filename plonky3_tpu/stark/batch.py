"""batch-stark (device-lean subset): many AIR instances under ONE trace
commitment and ONE shared FRI opening (batch-stark/src/prover.rs:103
flow, no-ZK, no-lookup; LogUp terminals slot in after the main commit —
see lookups.py).

CANONICAL IMPLEMENTATION: `stark/batch_ref.py` (`prove_batch_ref` /
`verify_batch_ref`) — it carries the full reference capability set
(LogUp lookups, global preprocessed, keygen/CommonData) and is the
layout whose proofs reproduce both reference batch fixtures
byte-for-byte. THIS module is the throughput-oriented subset kept for
lookup-free workloads (its quotient path reuses the jitted uni-stark
kernels); `BatchInstance` here is the shared instance type for both.

Transcript (batch-stark/src/transcript.rs):
  observe n_instances;
  per instance: (log_ext_degree, log_degree, width, num_quotient_chunks);
  main commitment root; per-instance public values; preprocessed widths;
  [permutation commitment if lookups]; alpha;
  quotient commitment root; zeta;
  pcs.open([(main, [[ζ, g_i·ζ]]), (quotient, [[ζ]]·chunks)]).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..air.api import get_log_num_quotient_chunks, get_symbolic_layout
from ..utils.bits import log2_strict
from .config import StarkConfig
from .prover import quotient_values
from .verifier import VerificationError


@dataclass
class BatchInstance:
    air: object
    trace: object  # (n, width) device wire-form
    public_values: list


@dataclass
class BatchProof:
    main_commit: tuple
    quotient_commit: tuple
    opened_main: list  # [instance] -> (local, next) lists of ext tuples
    opened_quotient: list  # [instance] -> [chunk] -> ext tuple list
    opening_proof: object
    degree_bits: list


def _observe_bindings(ch, config, instances, chunk_counts):
    ch.observe(len(instances))
    for inst, n_chunks in zip(instances, chunk_counts):
        log_n = log2_strict(inst.trace.shape[0])
        ch.observe(log_n)  # log_ext_degree (== log_degree, no ZK)
        ch.observe(log_n)
        ch.observe(inst.air.width)
        ch.observe(n_chunks)


def prove_batch(config: StarkConfig, instances: list) -> BatchProof:
    F, E, pcs = config.F, config.E, config.pcs

    chunk_counts = [
        1 << get_log_num_quotient_chunks(inst.air) for inst in instances
    ]
    trace_domains = [
        pcs.natural_domain_for_degree(inst.trace.shape[0])
        for inst in instances
    ]

    main_data = pcs.commit(
        [(dom, inst.trace) for dom, inst in zip(trace_domains, instances)]
    )

    ch = config.initialise_challenger()
    _observe_bindings(ch, config, instances, chunk_counts)
    ch.observe_digest(main_data.root_std)
    for inst in instances:
        ch.observe_many(inst.public_values)
    for _ in instances:
        ch.observe(0)  # preprocessed width

    alpha = ch.sample_ext(E.D)

    # per-instance quotient evaluation + chunk splitting
    all_chunks = []
    for i, (inst, dom, n_chunks) in enumerate(
        zip(instances, trace_domains, chunk_counts)
    ):
        log_n = dom.log_n
        qd = dom.create_disjoint_domain(n_chunks << log_n)
        t_on_qd = pcs.get_evaluations_on_domain(main_data, i, qd)
        n_cons, _ = get_symbolic_layout(inst.air)
        alpha_pows = E.powers_np(alpha, n_cons)[::-1].copy()
        publics_m = (
            jnp.asarray(
                F.to_monty_np(
                    np.asarray(inst.public_values, dtype=np.uint32)
                )
            )
            if inst.public_values
            else jnp.zeros((0,), jnp.uint32)
        )
        q = quotient_values(
            config, inst.air, dom, qd, t_on_qd, publics_m,
            jnp.asarray(alpha_pows),
        )
        q_flat = q.reshape(qd.size, E.D)
        for cdom, cevals in zip(
            qd.split_domains(n_chunks), qd.split_evals(n_chunks, q_flat)
        ):
            all_chunks.append((cdom, cevals))

    quotient_data = pcs.commit(all_chunks)
    ch.observe_digest(quotient_data.root_std)

    zeta = ch.sample_ext(E.D)
    main_points = [
        [zeta, dom.next_point_ext(E, zeta)] for dom in trace_domains
    ]
    opened, fri_proof = pcs.open(
        [
            (main_data, main_points),
            (quotient_data, [[zeta]] * len(all_chunks)),
        ],
        ch,
    )
    opened_main = [
        (opened[0][i][0], opened[0][i][1]) for i in range(len(instances))
    ]
    opened_quotient = []
    k = 0
    for n_chunks in chunk_counts:
        opened_quotient.append(
            [opened[1][k + j][0] for j in range(n_chunks)]
        )
        k += n_chunks
    return BatchProof(
        main_commit=main_data.root_std,
        quotient_commit=quotient_data.root_std,
        opened_main=opened_main,
        opened_quotient=opened_quotient,
        opening_proof=fri_proof,
        degree_bits=[d.log_n for d in trace_domains],
    )


def verify_batch(config: StarkConfig, airs, proof: BatchProof,
                 public_values) -> None:
    """Raises VerificationError on failure (verifier/mod.rs mirror)."""
    from ..air.api import _make_builder
    from ..air.builder import VerifierBackend
    from ..fri.verifier import FriError

    F, E, pcs = config.F, config.E, config.pcs
    n_inst = len(airs)
    if (
        len(proof.degree_bits) != n_inst
        or len(proof.opened_main) != n_inst
        or len(proof.opened_quotient) != n_inst
        or len(public_values) != n_inst
    ):
        raise VerificationError("InvalidProofShape: instance count")

    chunk_counts = [1 << get_log_num_quotient_chunks(a) for a in airs]
    trace_domains = [
        pcs.natural_domain_for_degree(1 << lb) for lb in proof.degree_bits
    ]
    for air, (lo, nx), chunks, n_chunks in zip(
        airs, proof.opened_main, proof.opened_quotient, chunk_counts
    ):
        if len(lo) != air.width or len(nx) != air.width:
            raise VerificationError("InvalidProofShape: trace width")
        if len(chunks) != n_chunks or any(
            len(c) != E.D for c in chunks
        ):
            raise VerificationError("InvalidProofShape: quotient chunks")

    class _Inst:
        pass

    insts = []
    for air, lb, pv in zip(airs, proof.degree_bits, public_values):
        i = _Inst()
        i.air = air
        i.trace = type("T", (), {"shape": (1 << lb, air.width)})()
        i.public_values = pv
        insts.append(i)

    ch = config.initialise_challenger()
    _observe_bindings(ch, config, insts, chunk_counts)
    ch.observe_digest(proof.main_commit)
    for pv in public_values:
        ch.observe_many(pv)
    for _ in airs:
        ch.observe(0)
    alpha = ch.sample_ext(E.D)
    ch.observe_digest(proof.quotient_commit)
    zeta = ch.sample_ext(E.D)

    # PCS verification
    main_coords = []
    quotient_coords = []
    chunk_domain_list = []
    for dom, (lo, nx), chunks, n_chunks in zip(
        trace_domains, proof.opened_main, proof.opened_quotient,
        chunk_counts,
    ):
        zeta_next = dom.next_point_ext(E, zeta)
        main_coords.append((dom, [(zeta, lo), (zeta_next, nx)]))
        qd = dom.create_disjoint_domain(n_chunks << dom.log_n)
        cds = qd.split_domains(n_chunks)
        chunk_domain_list.append(cds)
        for cdom, cvals in zip(cds, chunks):
            quotient_coords.append((cdom, [(zeta, cvals)]))
    try:
        pcs.verify(
            [
                (proof.main_commit, main_coords),
                (proof.quotient_commit, quotient_coords),
            ],
            proof.opening_proof,
            ch,
        )
    except FriError as e:
        raise VerificationError(f"InvalidOpeningArgument: {e}") from e

    # per-instance constraint check at zeta
    for air, dom, (lo, nx), chunks, cds, pv in zip(
        airs, trace_domains, proof.opened_main, proof.opened_quotient,
        chunk_domain_list, public_values,
    ):
        zps = []
        for i, cdom in enumerate(cds):
            acc = E.one_h()
            for j, other in enumerate(cds):
                if j == i:
                    continue
                num = other.vanishing_poly_at_point_ext(E, zeta)
                den = other.vanishing_poly_at_point_ext(
                    E, E.from_base_h(cdom.first_point())
                )
                acc = E.mul_h(acc, E.mul_h(num, E.inv_h(den)))
            zps.append(acc)
        quotient = E.zero_h()
        for zp, chunk in zip(zps, chunks):
            val = E.zero_h()
            for d, c in enumerate(chunk):
                basis = [0] * E.D
                basis[d] = 1
                val = E.add_h(val, E.mul_h(c, tuple(basis)))
            quotient = E.add_h(quotient, E.mul_h(zp, val))

        sels = dom.selectors_at_point_ext(E, zeta)
        backend = VerifierBackend(E, alpha)

        def entry(kind, j, lo=lo, nx=nx, sels=sels):
            if kind == "local":
                return lo[j]
            if kind == "next":
                return nx[j]
            return sels[kind]

        builder = _make_builder(
            backend, air.width, air.num_public_values, entry,
            lambda j, pv=pv: E.from_base_h(pv[j]),
        )
        air.eval(builder)
        if E.mul_h(backend.acc, sels["inv_vanishing"]) != quotient:
            raise VerificationError("OodEvaluationMismatch")
