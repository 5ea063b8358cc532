"""Lookup buses + interaction builder + batch-stark LogUp integration.

Re-design of the reference `lookup` crate (`lookup/src/bus.rs:26,137`
LookupBus/PermutationCheckBus, `builder.rs` InteractionBuilder,
`challenges.rs` bus-offset challenge table, `logup.rs` LogUpGadget,
`protocol.rs` terminal-sum verification) and its batch-stark wiring
(`batch-stark/src/prover.rs` ProverConstraintFolderWithLookups).

AIRs speak on buses inside their ordinary `eval`: the builder records
each `push_interaction` with backend-native values, so the SAME eval
serves degree counting (symbolic), aux-trace generation (numpy full
trace), quotient evaluation (device arrays), and the verifier's point
check — the one-eval/four-backend design extended to interactions.

LogUp layout per instance (logup.rs:88-104): aux column 0..D = shared
accumulator, then D columns per interaction (its fraction f_c). With
`denom_c = prefix[bus] - Σ_j β^{k-1-j}·field_j` (last element on β^0,
bus offset at β^W one power above any payload — challenges.rs):

    f_c · denom_c - count_c = 0            (fraction pin, every row)
    acc[0] = 0                             (first row)
    acc[i+1] = acc[i] + Σ_c f_c[i]         (transition)
    acc[n-1] + Σ_c f_c[n-1] = terminal     (last row)

Every instance commits one terminal; the verifier only accepts when the
terminals sum to zero across the batch (protocol.rs verify_terminal_sum).
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
from ..air.builder import DebugBackend, Sym, SymbolicBackend
from ..utils.bits import log2_strict
from .batch import BatchInstance, BatchProof, _observe_bindings
from .config import StarkConfig
from .lookup import _ext_mul_syms
from .prover import quotient_values
from .verifier import VerificationError


# ---------------------------------------------------------------------------
# buses (bus.rs)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class LookupBus:
    """Subset bus: one AIR provides a table, others query it."""

    name: str

    def lookup_key(self, builder, key, count=1, count_weight=1):
        builder.push_interaction(self.name, key, count, count_weight)

    def table_entry(self, builder, key, num_lookups):
        # provided entries are negative sends with zero height weight
        builder.push_interaction(
            self.name, key, -_as_sym(builder, num_lookups), 0
        )


@dataclass(frozen=True)
class PermutationCheckBus:
    """Multiset-equality bus: sends must exactly equal receives."""

    name: str

    def send(self, builder, fields, count=1, count_weight=1):
        builder.push_interaction(self.name, fields, count, count_weight)

    def receive(self, builder, fields, count=1, count_weight=1):
        builder.push_interaction(
            self.name, fields, -_as_sym(builder, count), count_weight
        )


def _as_sym(builder, x):
    if isinstance(x, Sym):
        return x
    return Sym(builder.backend, builder.backend.const(int(x)))


# ---------------------------------------------------------------------------
# challenge table (challenges.rs)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class Challenges:
    """denominator(bus, payload) = alpha + (bus+1)·β^W − combine(payload)."""

    E: object
    alpha: tuple
    beta: tuple
    max_width: int
    bus_prefix: tuple  # per bus index

    @staticmethod
    def new(E, alpha, beta, max_width, num_buses):
        assert max_width > 0
        gamma = E.exp_h(beta, max_width)
        prefix, prefixes = alpha, []
        for _ in range(num_buses):
            prefix = E.add_h(prefix, gamma)
            prefixes.append(prefix)
        return Challenges(
            E=E, alpha=alpha, beta=beta, max_width=max_width,
            bus_prefix=tuple(prefixes),
        )

    def beta_powers(self, k):
        out, acc = [], self.E.one_h()
        for _ in range(k):
            out.append(acc)
            acc = self.E.mul_h(acc, self.beta)
        return out


def collect_interactions(air: BaseAir):
    """Symbolic pass: interaction shapes (bus, width, count_weight)."""
    backend = SymbolicBackend()

    def entry(kind, j):
        return 0 if kind == "is_transition" else 1

    builder = _make_builder(
        backend, air.width, air.num_public_values, entry, lambda j: 0
    )
    air.eval(builder)
    return [
        dict(bus=i["bus"], width=len(i["fields"]),
             count_weight=i["count_weight"])
        for i in builder.interactions
    ]


def bus_index_map(airs):
    """Global bus name -> index, stable across prover/verifier (sorted)."""
    names = sorted(
        {i["bus"] for air in airs for i in collect_interactions(air)}
    )
    return {n: k for k, n in enumerate(names)}


# ---------------------------------------------------------------------------
# composite AIR (logup.rs constraints over flattened ext columns)
# ---------------------------------------------------------------------------
class BusLogUpAir(BaseAir):
    """inner constraints + LogUp fraction/accumulator constraints.

    Trace: [main (inner.width) | acc (D) | f_0 (D) | ... ].
    Publics: inner publics ++ terminal (D components).
    Challenges are baked as constants (the AIR is built after α/β are
    sampled; degree analysis sees them as degree-0)."""

    def __init__(self, inner: BaseAir, E, challenges: Challenges,
                 bus_index: dict, n_interactions: int):
        self.inner = inner
        self.E = E
        self.challenges = challenges
        self.bus_index = bus_index
        self.n_int = n_interactions
        self.field = inner.field
        self.width = inner.width + (n_interactions + 1) * E.D
        self.num_public_values = inner.num_public_values + E.D

    def eval(self, b):
        E, D = self.E, self.E.D
        inner_w = self.inner.width
        ch = self.challenges

        inner_builder = type(b)(
            b.backend,
            type(b.main)(
                local=b.main.local[:inner_w], next=b.main.next[:inner_w]
            ),
            b.public_values[: self.inner.num_public_values],
            b.is_first_row, b.is_last_row, b.is_transition,
        )
        self.inner.eval(inner_builder)
        # replay the inner constraints into the outer backend state:
        # inner_builder shares b.backend, so emissions already landed.
        inters = inner_builder.interactions
        assert len(inters) == self.n_int, "interaction count drift"

        def econst(ext):
            return [_as_sym(b, c) for c in ext]

        acc = b.main.local[inner_w : inner_w + D]
        acc_next = b.main.next[inner_w : inner_w + D]
        terminal = b.public_values[self.inner.num_public_values :]

        frac_cols = []
        for c, inter in enumerate(inters):
            base = inner_w + (c + 1) * D
            f = b.main.local[base : base + D]
            frac_cols.append(f)
            k = len(inter["fields"])
            bpows = ch.beta_powers(k)
            prefix = ch.bus_prefix[self.bus_index[inter["bus"]]]
            # denom = prefix - Σ_j β^{k-1-j}·field_j  (ext Sym list)
            denom = econst(prefix)
            for j, fld in enumerate(inter["fields"]):
                bp = bpows[k - 1 - j]
                for d in range(D):
                    denom[d] = denom[d] - fld * _as_sym(b, bp[d])
            # f·denom − count = 0 (count is base: component 0)
            pin = _ext_mul_syms(E, list(f), denom)
            pin[0] = pin[0] - inter["count"]
            for d in range(D):
                b.assert_zero(pin[d])

        # Σ_c f_c per row
        fsum = [None] * D
        for f in frac_cols:
            for d in range(D):
                fsum[d] = f[d] if fsum[d] is None else fsum[d] + f[d]
        if fsum[0] is None:
            fsum = [ _as_sym(b, 0) for _ in range(D)]

        first = b.when_first_row()
        for d in range(D):
            first.assert_zero(acc[d])
        trans = b.when_transition()
        for d in range(D):
            trans.assert_zero(acc_next[d] - acc[d] - fsum[d])
        last = b.when_last_row()
        for d in range(D):
            last.assert_zero(acc[d] + fsum[d] - terminal[d])


# ---------------------------------------------------------------------------
# aux trace generation (logup.rs generate_permutation, vectorized)
# ---------------------------------------------------------------------------
def generate_interaction_trace(E, air: BaseAir, trace_std: np.ndarray,
                               public_values, challenges: Challenges,
                               bus_index: dict):
    """Numeric eval of the interactions over the whole trace, then
    batched fraction/accumulator assembly.

    Returns (aux_std (n, (n_int+1)·D), terminal ext tuple)."""
    F = E.base
    n = trace_std.shape[0]
    backend = DebugBackend(F=F, n_rows=n)
    tr = trace_std.astype(np.uint64)
    nxt = np.roll(tr, -1, axis=0)
    first = np.zeros(n, np.uint64)
    first[0] = 1
    last = np.zeros(n, np.uint64)
    last[-1] = 1
    trans = np.ones(n, np.uint64)
    trans[-1] = 0

    def entry(kind, j):
        if kind == "local":
            return tr[:, j]
        if kind == "next":
            return nxt[:, j]
        return {"is_first_row": first, "is_last_row": last,
                "is_transition": trans}[kind]

    builder = _make_builder(
        backend, air.width, air.num_public_values, entry,
        lambda j: np.full(n, int(public_values[j]) % F.P, np.uint64),
    )
    air.eval(builder)
    inters = builder.interactions
    n_int = len(inters)
    if n_int == 0:
        return np.zeros((n, E.D), np.uint32), E.zero_h()

    # denominators (n_int, n, D) monty
    denoms = np.zeros((n_int, n, E.D), np.uint32)
    counts_m = np.zeros((n_int, n), np.uint32)
    for c, inter in enumerate(inters):
        k = len(inter["fields"])
        bpows = challenges.beta_powers(k)
        prefix = challenges.bus_prefix[bus_index[inter["bus"]]]
        comb = np.broadcast_to(
            np.asarray(E.to_monty_np(prefix)), (n, E.D)
        ).copy()
        for j, fld in enumerate(inter["fields"]):
            fm = F.to_monty_np(np.asarray(fld.v, dtype=np.uint64))
            bp_m = np.asarray(E.to_monty_np(bpows[k - 1 - j]))
            comb = E.sub_np(comb, E.base_mul_np(fm, bp_m))
        denoms[c] = comb
        counts_m[c] = F.to_monty_np(np.asarray(inter["count"].v,
                                               dtype=np.uint64))

    # one batched extension inverse for every (interaction, row)
    inv = np.asarray(E.inv(jnp.asarray(denoms.reshape(n_int * n, E.D))))
    inv = inv.reshape(n_int, n, E.D)
    fracs = E.base_mul_np(counts_m, inv)  # (n_int, n, D) monty

    fsum = fracs.astype(np.uint64).sum(axis=0) % np.uint64(F.P)  # (n, D)
    acc_inc = np.cumsum(fsum, axis=0, dtype=np.uint64) % np.uint64(F.P)
    acc_std = np.zeros((n, E.D), np.uint64)
    acc_std[1:] = acc_inc[:-1]
    terminal_m = tuple(int(x) for x in acc_inc[-1])

    aux_m = np.concatenate(
        [acc_std.astype(np.uint32).reshape(n, E.D)]
        + [fracs[c] for c in range(n_int)],
        axis=1,
    )
    # aux assembled in monty; convert to std for the caller's to_monty
    aux_std = F.from_monty_np(aux_m.astype(np.uint32))
    terminal = E.from_monty_np(np.asarray(terminal_m, dtype=np.uint32))
    return aux_std, terminal


# ---------------------------------------------------------------------------
# batch-stark with lookups (batch-stark/src/prover.rs lookup wiring)
# ---------------------------------------------------------------------------
@dataclass
class BatchLookupProof:
    base: BatchProof
    perm_commit: tuple
    opened_perm: list  # [instance] -> (local, next)
    terminals: list  # [instance] -> ext tuple or None


MAX_WIDTH_DEFAULT = 8


def prove_batch_with_lookups(config: StarkConfig, instances: list
                             ) -> BatchLookupProof:
    F, E, pcs = config.F, config.E, config.pcs
    airs = [inst.air for inst in instances]
    bus_index = bus_index_map(airs)
    metas = [collect_interactions(a) for a in airs]
    max_w = max(
        [MAX_WIDTH_DEFAULT]
        + [m["width"] for meta in metas for m in meta]
    )

    # soundness: Σ count_weight_i · height_i < P (types.rs:48)
    total = sum(
        m["count_weight"] * inst.trace.shape[0]
        for inst, meta in zip(instances, metas)
        for m in meta
    )
    assert total < F.P, "lookup multiplicity height bound exceeded"

    chunk_counts = []
    trace_domains = [
        pcs.natural_domain_for_degree(inst.trace.shape[0])
        for inst in instances
    ]
    main_data = pcs.commit(
        [(dom, inst.trace) for dom, inst in zip(trace_domains, instances)]
    )

    ch = config.initialise_challenger()
    # bindings use the COMPOSITE widths/chunks, fixed after challenge
    # sampling — so bind the raw instance shapes first, as the reference
    # transcript does (perm shape is derived data).
    dummy_chunks = [1] * len(instances)
    ch.observe(len(instances))
    for inst in instances:
        log_n = log2_strict(inst.trace.shape[0])
        ch.observe(log_n)
        ch.observe(log_n)
        ch.observe(inst.air.width)
    ch.observe_digest(main_data.root_std)
    for inst in instances:
        ch.observe_many(inst.public_values)

    alpha_l = ch.sample_ext(E.D)
    beta_l = ch.sample_ext(E.D)
    challenges = Challenges.new(E, alpha_l, beta_l, max_w, len(bus_index))

    aux_traces, terminals = [], []
    for inst in instances:
        trace_std = F.from_monty_np(np.asarray(inst.trace))
        aux_std, terminal = generate_interaction_trace(
            E, inst.air, trace_std, inst.public_values, challenges,
            bus_index,
        )
        aux_traces.append(jnp.asarray(F.to_monty_np(aux_std)))
        terminals.append(terminal)
    perm_data = pcs.commit(
        [(dom, aux) for dom, aux in zip(trace_domains, aux_traces)]
    )
    ch.observe_digest(perm_data.root_std)
    for t in terminals:
        ch.observe_ext(t)

    alpha = ch.sample_ext(E.D)

    composites = [
        BusLogUpAir(inst.air, E, challenges, bus_index, len(meta))
        for inst, meta in zip(instances, metas)
    ]
    chunk_counts = [1 << get_log_num_quotient_chunks(c) for c in composites]

    all_chunks = []
    for i, (inst, comp, dom, n_chunks, terminal) in enumerate(
        zip(instances, composites, trace_domains, chunk_counts, terminals)
    ):
        log_n = dom.log_n
        qd = dom.create_disjoint_domain(n_chunks << log_n)
        t_on_qd = pcs.get_evaluations_on_domain(main_data, i, qd)
        p_on_qd = pcs.get_evaluations_on_domain(perm_data, i, qd)
        both = jnp.concatenate([t_on_qd, p_on_qd], axis=1)
        n_cons, _ = get_symbolic_layout(comp)
        alpha_pows = E.powers_np(alpha, n_cons)[::-1].copy()
        publics_all = list(inst.public_values) + list(terminal)
        publics_m = jnp.asarray(
            F.to_monty_np(np.asarray(publics_all, dtype=np.uint32))
        )
        q = quotient_values(
            config, comp, dom, qd, both, publics_m,
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
            (perm_data, [list(p) for p in main_points]),
            (quotient_data, [[zeta]] * len(all_chunks)),
        ],
        ch,
    )
    opened_main = [
        (opened[0][i][0], opened[0][i][1]) for i in range(len(instances))
    ]
    opened_perm = [
        (opened[1][i][0], opened[1][i][1]) for i in range(len(instances))
    ]
    opened_quotient = []
    k = 0
    for n_chunks in chunk_counts:
        opened_quotient.append(
            [opened[2][k + j][0] for j in range(n_chunks)]
        )
        k += n_chunks
    base = BatchProof(
        main_commit=main_data.root_std,
        quotient_commit=quotient_data.root_std,
        opened_main=opened_main,
        opened_quotient=opened_quotient,
        opening_proof=fri_proof,
        degree_bits=[d.log_n for d in trace_domains],
    )
    return BatchLookupProof(
        base=base,
        perm_commit=perm_data.root_std,
        opened_perm=opened_perm,
        terminals=terminals,
    )


def verify_batch_with_lookups(config: StarkConfig, airs,
                              proof: BatchLookupProof, public_values):
    """Replay the transcript, enforce the cross-AIR terminal sum, then
    check the composite constraint identity at zeta per instance and the
    shared opening (verify_batch structure + protocol.rs terminal sum)."""
    from ..air.api import _make_builder
    from ..air.builder import VerifierBackend
    from ..fri.verifier import FriError

    F, E, pcs = config.F, config.E, config.pcs
    bus_index = bus_index_map(airs)
    metas = [collect_interactions(a) for a in airs]
    max_w = max(
        [MAX_WIDTH_DEFAULT] + [m["width"] for meta in metas for m in meta]
    )
    base = proof.base

    total = E.zero_h()
    for t in proof.terminals:
        total = E.add_h(total, t)
    if total != E.zero_h():
        raise VerificationError("cross-AIR lookup terminal sum non-zero")

    ch = config.initialise_challenger()
    ch.observe(len(airs))
    for air, log_n in zip(airs, base.degree_bits):
        ch.observe(log_n)
        ch.observe(log_n)
        ch.observe(air.width)
    ch.observe_digest(base.main_commit)
    for pv in public_values:
        ch.observe_many(pv)

    alpha_l = ch.sample_ext(E.D)
    beta_l = ch.sample_ext(E.D)
    challenges = Challenges.new(E, alpha_l, beta_l, max_w, len(bus_index))
    ch.observe_digest(proof.perm_commit)
    for t in proof.terminals:
        ch.observe_ext(t)

    alpha = ch.sample_ext(E.D)
    ch.observe_digest(base.quotient_commit)
    zeta = ch.sample_ext(E.D)

    composites = [
        BusLogUpAir(air, E, challenges, bus_index, len(meta))
        for air, meta in zip(airs, metas)
    ]
    chunk_counts = [1 << get_log_num_quotient_chunks(c) for c in composites]
    trace_domains = [
        pcs.natural_domain_for_degree(1 << lb) for lb in base.degree_bits
    ]

    main_coords, perm_coords, quotient_coords = [], [], []
    chunk_domain_list = []
    for dom, (lo, nx), (lp, np_), chunks, n_chunks in zip(
        trace_domains, base.opened_main, proof.opened_perm,
        base.opened_quotient, chunk_counts,
    ):
        zeta_next = dom.next_point_ext(E, zeta)
        main_coords.append((dom, [(zeta, lo), (zeta_next, nx)]))
        perm_coords.append((dom, [(zeta, lp), (zeta_next, np_)]))
        qd = dom.create_disjoint_domain(n_chunks << dom.log_n)
        cds = qd.split_domains(n_chunks)
        chunk_domain_list.append(cds)
        for cdom, cvals in zip(cds, chunks):
            quotient_coords.append((cdom, [(zeta, cvals)]))
    try:
        pcs.verify(
            [
                (base.main_commit, main_coords),
                (proof.perm_commit, perm_coords),
                (base.quotient_commit, quotient_coords),
            ],
            base.opening_proof,
            ch,
        )
    except FriError as e:
        raise VerificationError(f"InvalidOpeningArgument: {e}") from e

    # per-instance composite constraint identity at zeta
    for comp, meta, dom, (lo_m, nx_m), (lo_p, nx_p), chunks, cds, pv, \
            terminal in zip(
        composites, metas, trace_domains, base.opened_main,
        proof.opened_perm, base.opened_quotient, chunk_domain_list,
        public_values, proof.terminals,
    ):
        if len(lo_m) != comp.inner.width or len(lo_p) != (
            len(meta) + 1
        ) * E.D:
            raise VerificationError("InvalidProofShape: opened widths")
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
        lo = list(lo_m) + list(lo_p)
        nx = list(nx_m) + list(nx_p)
        publics_all = [int(x) for x in pv] + [int(c) for c in terminal]

        def entry(kind, j, lo=lo, nx=nx, sels=sels):
            if kind == "local":
                return lo[j]
            if kind == "next":
                return nx[j]
            return sels[kind]

        builder = _make_builder(
            backend, comp.width, comp.num_public_values, entry,
            lambda j, pa=publics_all: E.from_base_h(pa[j]),
        )
        comp.eval(builder)
        if E.mul_h(backend.acc, sels["inv_vanishing"]) != quotient:
            raise VerificationError("OodEvaluationMismatch (lookup batch)")
