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

from functools import partial

import jax
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


@partial(
    jax.jit,
    static_argnames=(
        "config", "air", "trace_domain", "quotient_domain", "rows_order",
    ),
)
def quotient_values(
    config: StarkConfig,
    air: BaseAir,
    trace_domain,
    quotient_domain,
    trace_on_quotient_domain,  # (Nq, w) device, order per rows_order
    publics_m,  # (n_publics,) device uint32 Monty
    alpha_pows,  # (K, D) device uint32 Monty, descending powers
    rows_order: str = "natural",
):
    """Evaluate C(T(x), T(hx), sels(x))/Z_H(x) over the whole quotient
    domain in ONE jitted program (prover.rs:399-555; the packing width is
    the entire domain — constraint eval, alpha fold, selectors and the
    inv-vanishing scale all fuse).

    rows_order='bitrev': rows arrive in the committed bit-reversed LDE
    order (a free prefix slice — no 1.4 GB natural-order gather) and the
    output stays in that order; only valid for AIRs with no next-row
    constraints (row adjacency is meaningless in bitrev order). The
    selector vectors are gathered into bitrev order instead (Nq-sized,
    cheap)."""
    F, E = config.F, config.E
    Nq = quotient_domain.size
    sels = trace_domain.selectors_on_coset_device(quotient_domain)
    if rows_order == "bitrev":
        from ..utils.bits import bitrev_permute_axis0 as _br

        assert air.main_next_row_columns() == []
        sels = {k: _br(v, quotient_domain.log_n) for k, v in sels.items()}
        local = trace_on_quotient_domain
        nxt = local  # unused: no next-row constraints
    else:
        next_step = Nq // trace_domain.size
        local = trace_on_quotient_domain
        nxt = jnp.roll(trace_on_quotient_domain, -next_step, axis=0)

    if hasattr(air, "fold_constraints_device"):
        # AIR-provided array/scaned fold (same alpha assignment as the
        # generic emission order — see the AIR's docstring)
        folded = air.fold_constraints_device(
            F, E, local, nxt, sels, publics_m, alpha_pows
        )
    else:
        backend = ProverBackend(F, E, alpha_pows)

        def entry(kind, j):
            if kind == "local":
                return local[:, j]
            if kind == "next":
                return nxt[:, j]
            return sels[kind]

        pcols = air.periodic_columns()
        pv = (
            periodic_on_coset(F, pcols, trace_domain, quotient_domain)
            if pcols
            else None
        )
        if pv is not None and rows_order == "bitrev":
            from ..utils.bits import bitrev_permute_axis0 as _brp

            pv = _brp(pv, quotient_domain.log_n)
        builder = _make_builder(
            backend, air.width, air.num_public_values, entry,
            lambda j: publics_m[j],
            num_periodic=len(pcols),
            periodic_entry=(lambda j: pv[:, j]) if pcols else None,
        )
        air.eval(builder)
        folded = backend.finalize((Nq,))  # (Nq, D)
    return E.base_mul(sels["inv_vanishing"], folded)


def periodic_coeffs(F, col):
    """Host-exact inverse DFT of one period (p small)."""
    p = len(col)
    assert p & (p - 1) == 0, "periodic column length must be a power of 2"
    g_inv = F.inv_h(F.two_adic_generator_h(p.bit_length() - 1)) if p > 1 else 1
    p_inv = F.inv_h(p)
    coeffs = []
    for k in range(p):
        acc, x, xp = 0, F.exp_h(g_inv, k), 1
        for i in range(p):
            acc = (acc + col[i] * xp) % F.P
            xp = F.mul_h(xp, x)
        coeffs.append(F.mul_h(acc, p_inv))
    return coeffs


def periodic_on_coset(F, pcols, trace_domain, quotient_domain):
    """(Nq, k) device Monty values of each periodic extension f(X^r)
    over the quotient coset (prover.rs:434 build_periodic_lde_table):
    f has period p, r = n/p; over the coset s·<g_Nq> the composed values
    cycle with period Nq/r, so one small coset evaluation tiles up."""
    from ..ops.ntt import coset_evals_from_coeffs
    from ..utils.bits import bitrev_permute_axis0

    n = trace_domain.size
    Nq = quotient_domain.size
    s = quotient_domain.shift
    cols = []
    for col in pcols:
        p = len(col)
        assert p <= n and n % p == 0
        r = n // p
        small = Nq // r
        coeffs = periodic_coeffs(F, col)
        cm = jnp.asarray(
            F.to_monty_np(np.asarray(coeffs, dtype=np.uint32))
        ).reshape(p, 1)
        ev_br = coset_evals_from_coeffs(
            F, cm, (small // p).bit_length() - 1, F.exp_h(s, r)
        )
        ev = bitrev_permute_axis0(ev_br, small.bit_length() - 1)[:, 0]
        cols.append(jnp.tile(ev, r))
    return jnp.stack(cols, axis=1)


def prove(
    config: StarkConfig,
    air: BaseAir,
    trace,  # (n, width) device uint32 Monty, natural row order
    public_values,  # list[int] standard form
    spans=None,  # optional dict collecting per-phase wall-clock seconds
) -> Proof:
    import time as _time

    _t = {"last": _time.perf_counter()}

    def _mark(name):
        if spans is not None:
            now = _time.perf_counter()
            spans[name] = spans.get(name, 0.0) + now - _t["last"]
            _t["last"] = now

    F, E, pcs = config.F, config.E, config.pcs
    if getattr(pcs, "ZK", False):
        from .zk import prove_zk

        return prove_zk(config, air, trace, public_values)
    n = trace.shape[0]
    log_n = log2_strict(n)

    log_num_chunks = get_log_num_quotient_chunks(air)
    num_chunks = 1 << log_num_chunks

    trace_domain = pcs.natural_domain_for_degree(n)
    trace_data = pcs.commit([(trace_domain, trace)])
    if hasattr(trace_data, "layers"):
        jax.block_until_ready(trace_data.layers[-1])
    _mark("commit trace")

    ch = config.initialise_challenger()
    ch.observe(log_n)  # log_ext_degree (== log_n without ZK)
    ch.observe(log_n)
    ch.observe(0)  # preprocessed width
    ch.observe_digest(trace_data.commitment)
    ch.observe_many(public_values)

    alpha = ch.sample_ext(E.D)

    quotient_domain = trace_domain.create_disjoint_domain(
        1 << (log_n + log_num_chunks)
    )
    # AIRs with no next-row constraints evaluate the quotient directly in
    # the committed bitrev row order: the LDE restriction is a free
    # prefix slice instead of a full-matrix row gather.
    uses_next = air.main_next_row_columns() != []
    q_order = (
        "bitrev"
        if not uses_next and getattr(pcs, "supports_bitrev_evals", False)
        else "natural"
    )
    if q_order == "bitrev":
        trace_on_qd = pcs.get_evaluations_on_domain(
            trace_data, 0, quotient_domain, order="bitrev"
        )
    else:
        trace_on_qd = pcs.get_evaluations_on_domain(
            trace_data, 0, quotient_domain
        )
    num_constraints, _ = get_symbolic_layout(air)
    alpha_pows = E.powers_np(alpha, num_constraints)[::-1].copy()
    publics_m = jnp.asarray(
        F.to_monty_np(np.asarray(public_values, dtype=np.uint32))
    ) if public_values else jnp.zeros((0,), jnp.uint32)
    q_vals = quotient_values(
        config, air, trace_domain, quotient_domain,
        trace_on_qd, publics_m, jnp.asarray(alpha_pows),
        rows_order=q_order,
    )  # (Nq, D)
    if q_order == "bitrev":
        from ..utils.bits import bitrev_permute_axis0

        q_vals = bitrev_permute_axis0(q_vals, quotient_domain.log_n)
    jax.block_until_ready(q_vals)
    _mark("quotient eval")

    # flatten ext -> base columns, split into chunks, commit
    # (prover.rs:235-255, univariate.rs:98 commit_quotient)
    q_flat = q_vals.reshape(quotient_domain.size, E.D)
    sub_evals = quotient_domain.split_evals(num_chunks, q_flat)
    sub_domains = quotient_domain.split_domains(num_chunks)
    quotient_data = pcs.commit(list(zip(sub_domains, sub_evals)))
    if hasattr(quotient_data, "layers"):
        jax.block_until_ready(quotient_data.layers[-1])
    _mark("commit quotient")
    ch.observe_digest(quotient_data.commitment)

    zeta = ch.sample_ext(E.D)
    zeta_next = trace_domain.next_point_ext(E, zeta)

    # AIRs that never read an offset-1 main entry declare it
    # (air/src/air.rs main_next_row_columns): the trace then opens at
    # zeta only, shrinking the proof and the ys work.
    trace_points = [zeta, zeta_next] if uses_next else [zeta]
    opened, fri_proof = pcs.open(
        [
            (trace_data, [trace_points]),
            (quotient_data, [[zeta]] * num_chunks),
        ],
        ch,
        spans=spans,
    )
    _mark("open (pcs + fri)")
    return Proof(
        commitments=Commitments(
            trace=trace_data.commitment,
            quotient_chunks=quotient_data.commitment,
        ),
        opened_values=OpenedValues(
            trace_local=opened[0][0][0],
            trace_next=opened[0][0][1] if uses_next else None,
            quotient_chunks=[opened[1][i][0] for i in range(num_chunks)],
        ),
        opening_proof=fri_proof,
        degree_bits=log_n,
    )
