"""Masked (HVZK) zerocheck — the `sumcheck/src/zk` analog
(Construction 6.3 of eprint 2026/391; sumcheck/src/zk/{mod,verifier}.rs).

The plain zerocheck's round polynomials are affine functions of the
witness. This variant blinds every wire with one full-degree univariate
mask per round:

  1. Prover samples n univariate masks s_j of degree deg_round (ext
     coefficients), stacks their coefficient components into one base
     multilinear and commits it with the HIDING WHIR (the mask oracle —
     the reference commits masks under a zk-code and authenticates their
     evaluations through the committed-sumcheck relation; here the
     hiding WHIR plays that oracle's role directly).
  2. Prover sends mu = Σ_x M(x) = Σ_j 2^{n-1}(s_j(0)+s_j(1)) where
     M(x) = Σ_j s_j(x_j); verifier samples the combiner eps.
  3. Sumcheck runs on G = eps·eq(r,x)·C(x) + M(x); wire j:
        h_j(X) = eps·f_j(X) + 2^{n-j-1}·(A_j + s_j(X))·2
                 + 2^{n-j-2}·Σ_{l>j}(s_l(0)+s_l(1))
     (0-based j; A_j = Σ_{l<j} s_l(γ_l)) — every wire coefficient is
     masked by the one-time s_j.
  4. Final anchor: target = eps·eq(r,γ)·C(openings) + Σ_l s_l(γ_l); the
     mask values are authenticated by ONE batched hiding-WHIR opening:
     s_l(γ_l) components are MLE evaluations of the mask multilinear at
     (power_point(γ_l), bits(d), bits(l)).

What is revealed: the claimed trace-MLE openings at γ (the statement's
output, as in the plain zerocheck) and the mask values s_l(γ_l); wires
are uniform given the one-time masks, mask-oracle queries sit inside
the zk-code budget.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..utils.bits import log2_ceil
from .hiding_whir import HidingWhirPcs
from .mle import eq_table_device
from .sumcheck import (
    SumcheckProof,
    _eval_constraints,
    _fold_ext,
    _fold_t,
    _lagrange_at,
    boundary_evals_at,
    get_ml_layout,
    selector_tables_device,
)


@dataclass
class MaskedZerocheckProof:
    mask_commit: tuple
    mu: tuple  # claimed hypercube sum of the mask polynomial
    rounds: list  # [n] -> [deg_round+1] wire evals at t = 0..deg
    final_local: list
    final_next: list
    mask_values: list  # [n][D] ext: per-round, per-component s_l(gamma)[d]
    mask_opening: object  # HidingWhirProof (batched multi-point)


def _power_point(E, gamma, log_ell):
    out, g = [], gamma
    for _ in range(log_ell):
        out.append(g)
        g = E.mul_h(g, g)
    return out


def _bits_point(E, v, nbits):
    return [E.from_base_h((v >> b) & 1) for b in range(nbits)]


def _eval_univariate(E, coeffs, x):
    acc = E.zero_h()
    for c in reversed(coeffs):
        acc = E.add_h(E.mul_h(acc, x), c)
    return acc


def _mask_layout(E, n, ell):
    """(log_ell, d_bits, j_bits, flat_len) of the stacked mask vector:
    flat[k + ell_pad·(d + D·j)] = s_j coefficient k, component d."""
    log_ell = log2_ceil(max(ell, 2))
    d_bits = log2_ceil(max(E.D, 2))
    j_bits = log2_ceil(max(n, 2))
    flat_len = 1 << (log_ell + d_bits + j_bits)
    return log_ell, d_bits, j_bits, flat_len


def _mask_point(E, gamma, l, d, log_ell, d_bits, j_bits):
    return (
        _power_point(E, gamma, log_ell)
        + _bits_point(E, d, d_bits)
        + _bits_point(E, l, j_bits)
    )


def prove_masked_zerocheck(E, air, trace_std, publics, challenger,
                           mask_pcs: HidingWhirPcs, rng):
    F = E.base
    n_rows, w = trace_std.shape
    num_vars = n_rows.bit_length() - 1
    n_cons, max_deg = get_ml_layout(air)
    deg_round = max_deg + 1
    ell = deg_round + 1
    log_ell, d_bits, j_bits, flat_len = _mask_layout(E, num_vars, ell)

    # 1. masks + hiding commitment
    masks = [
        [
            tuple(int(v) for v in F.rand_np(rng, (E.D,), monty=False))
            for _ in range(ell)
        ]
        for _ in range(num_vars)
    ]
    # Slot layout: low log_ell coords hold monomial coefficients (power
    # points evaluate the univariate), the (d, j) selector coords hold
    # EVALUATION-basis values — the committed monomial coefficients are
    # their Möbius transform, so evaluating at bits(d), bits(j) isolates
    # exactly one slot (a monomial evaluation at 0/1 coordinates sums
    # the downward-closed set otherwise).
    ell_pad = 1 << log_ell
    sel_bits = d_bits + j_bits
    cube = np.zeros((ell_pad, 1 << sel_bits), np.uint64)
    for j, coeffs in enumerate(masks):
        for k, c in enumerate(coeffs):
            for d in range(E.D):
                cube[k, d + (1 << d_bits) * j] = c[d]
    P64 = np.uint64(F.P)
    for bit in range(sel_bits):
        m = 1 << bit
        for t in range(1 << sel_bits):
            if t & m:
                cube[:, t] = (cube[:, t] + P64 - cube[:, t ^ m]) % P64
    flat = np.zeros(flat_len, np.uint32)
    for t in range(1 << sel_bits):
        flat[t * ell_pad : (t + 1) * ell_pad] = cube[:, t]
    mask_commit, mask_data = mask_pcs.commit_hiding_coeffs(flat, rng)
    challenger.observe_digest(mask_commit)

    # 2. mu = sum over the cube of M
    two_pow = pow(2, num_vars - 1, F.P)
    mu = E.zero_h()
    for coeffs in masks:
        s0 = coeffs[0]
        s1 = E.zero_h()
        for c in coeffs:
            s1 = E.add_h(s1, c)
        mu = E.add_h(mu, E.base_mul_h(two_pow, E.add_h(s0, s1)))
    challenger.observe_ext(mu)
    eps = challenger.sample_ext(E.D)

    # 3. sumcheck on eps·(eq·C) + M — device tables for the f part
    r = [challenger.sample_ext(E.D) for _ in range(num_vars)]
    alpha = challenger.sample_ext(E.D)
    alpha_pows = [E.one_h()]
    for _ in range(n_cons - 1):
        alpha_pows.append(E.mul_h(alpha_pows[-1], alpha))
    ap_m = jnp.asarray(
        np.stack([E.to_monty_np(a) for a in reversed(alpha_pows)])
    )
    tr_m = F.to_monty_np(trace_std.astype(np.uint64).astype(np.uint32))
    sh_m = F.to_monty_np(
        np.roll(trace_std, -1, axis=0).astype(np.uint64).astype(np.uint32)
    )

    def lift(mat):
        z = np.zeros(mat.shape + (E.D,), np.uint32)
        z[..., 0] = mat
        return jnp.asarray(z)

    cols_local = [lift(tr_m[:, j]) for j in range(w)]
    cols_next = [lift(sh_m[:, j]) for j in range(w)]
    eq = eq_table_device(E, r)
    sel_first, sel_last = selector_tables_device(E, num_vars)

    sums01 = [None] * num_vars  # s_l(0) + s_l(1)
    for l, coeffs in enumerate(masks):
        sums01[l] = E.add_h(
            coeffs[0], _eval_univariate(E, coeffs, E.one_h())
        )

    rounds = []
    chs = []
    acc_masks = E.zero_h()  # A_j
    for rnd in range(num_vars):
        suffix = E.zero_h()
        for l in range(rnd + 1, num_vars):
            suffix = E.add_h(suffix, sums01[l])
        w_free = num_vars - rnd - 1  # free vars after this one
        evals_t = []
        for t in range(deg_round + 1):
            loc_t = [_fold_t(E, c, t) for c in cols_local]
            nxt_t = [_fold_t(E, c, t) for c in cols_next]
            eq_t = _fold_t(E, eq, t)
            cvals = _eval_constraints(
                E, air, loc_t, nxt_t, publics, ap_m,
                sel_first=_fold_t(E, sel_first, t),
                sel_last=_fold_t(E, sel_last, t),
            )
            total = E.mul(eq_t, cvals)
            f_t = tuple(
                int(x)
                for x in F.from_monty_np(
                    np.asarray(F.sum(total, axis=0))
                )
            )
            s_t = _eval_univariate(
                E, masks[rnd], E.from_base_h(t)
            )
            m_t = E.base_mul_h(
                pow(2, w_free, F.P), E.add_h(acc_masks, s_t)
            )
            if w_free >= 1:
                m_t = E.add_h(
                    m_t,
                    E.base_mul_h(pow(2, w_free - 1, F.P), suffix),
                )
            wire = E.add_h(E.mul_h(eps, f_t), m_t)
            evals_t.append(wire)
        rounds.append(evals_t)
        for y in evals_t:
            challenger.observe_ext(y)
        ch = challenger.sample_ext(E.D)
        chs.append(ch)
        cols_local = [_fold_ext(E, c, ch) for c in cols_local]
        cols_next = [_fold_ext(E, c, ch) for c in cols_next]
        eq = _fold_ext(E, eq, ch)
        sel_first = _fold_ext(E, sel_first, ch)
        sel_last = _fold_ext(E, sel_last, ch)
        acc_masks = E.add_h(
            acc_masks, _eval_univariate(E, masks[rnd], ch)
        )

    final_local = [
        tuple(int(x) for x in F.from_monty_np(np.asarray(c[0])))
        for c in cols_local
    ]
    final_next = [
        tuple(int(x) for x in F.from_monty_np(np.asarray(c[0])))
        for c in cols_next
    ]
    for v in final_local:
        challenger.observe_ext(v)
    for v in final_next:
        challenger.observe_ext(v)

    # 4. batched mask opening at the bound points. The claimed values
    # are observed BEFORE lambda so the combiner binds them.
    mask_values = []
    for l in range(num_vars):
        comps = []
        for d in range(E.D):
            coeffs_d = [E.from_base_h(c[d]) for c in masks[l]]
            comps.append(_eval_univariate(E, coeffs_d, chs[l]))
        mask_values.append(comps)
        for v in comps:
            challenger.observe_ext(v)
    lam = challenger.sample_ext(E.D)
    lp = E.one_h()
    points_scales = []
    claim = E.zero_h()
    for l in range(num_vars):
        for d in range(E.D):
            pt = _mask_point(
                E, chs[l], l, d, log_ell, d_bits, j_bits
            )
            points_scales.append((pt, lp))
            claim = E.add_h(
                claim, E.mul_h(lp, mask_values[l][d])
            )
            lp = E.mul_h(lp, lam)
    mask_opening = mask_pcs.open_hiding_multi(
        mask_data, points_scales, claim, challenger, rng
    )
    return MaskedZerocheckProof(
        mask_commit=mask_commit, mu=mu, rounds=rounds,
        final_local=final_local, final_next=final_next,
        mask_values=mask_values, mask_opening=mask_opening,
    )


def verify_masked_zerocheck(E, air, num_vars, publics,
                            proof: MaskedZerocheckProof, challenger,
                            mask_pcs: HidingWhirPcs):
    from ..air.api import _make_builder
    from ..air.builder import VerifierBackend

    F = E.base
    n_cons, max_deg = get_ml_layout(air)
    deg_round = max_deg + 1
    ell = deg_round + 1
    log_ell, d_bits, j_bits, flat_len = _mask_layout(E, num_vars, ell)

    challenger.observe_digest(proof.mask_commit)
    challenger.observe_ext(proof.mu)
    eps = challenger.sample_ext(E.D)
    r = [challenger.sample_ext(E.D) for _ in range(num_vars)]
    alpha = challenger.sample_ext(E.D)

    if len(proof.rounds) != num_vars:
        raise ValueError("RoundCountMismatch")
    claim = proof.mu  # eps·0 + mu
    chs = []
    for rnd, evals_t in enumerate(proof.rounds):
        if len(evals_t) != deg_round + 1:
            raise ValueError("RoundPolyDegreeMismatch")
        if E.add_h(evals_t[0], evals_t[1]) != claim:
            raise ValueError(f"MaskedRoundMismatch round {rnd}")
        for y in evals_t:
            challenger.observe_ext(y)
        ch = challenger.sample_ext(E.D)
        chs.append(ch)
        claim = _lagrange_at(E, evals_t, ch)

    for v in proof.final_local:
        challenger.observe_ext(v)
    for v in proof.final_next:
        challenger.observe_ext(v)

    # mask openings: claimed values observed first, then the combiner
    if len(proof.mask_values) != num_vars:
        raise ValueError("MaskValueCountMismatch")
    for comps in proof.mask_values:
        if len(comps) != E.D:
            raise ValueError("MaskValueShapeMismatch")
        for v in comps:
            challenger.observe_ext(v)
    lam = challenger.sample_ext(E.D)
    lp = E.one_h()
    points_scales = []
    open_claim = E.zero_h()
    for l in range(num_vars):
        for d in range(E.D):
            pt = _mask_point(
                E, chs[l], l, d, log_ell, d_bits, j_bits
            )
            points_scales.append((pt, lp))
            open_claim = E.add_h(
                open_claim, E.mul_h(lp, proof.mask_values[l][d])
            )
            lp = E.mul_h(lp, lam)
    n1 = flat_len.bit_length() - 1
    mask_pcs.verify_hiding_multi(
        proof.mask_commit, n1, points_scales, open_claim,
        proof.mask_opening, challenger,
    )

    # final anchor: eps·eq(r,chs)·C(openings) + Σ_l s_l(chs_l) == claim
    eq_val = E.one_h()
    for ri, ci in zip(r, chs):
        term = E.add_h(
            E.mul_h(ri, ci),
            E.mul_h(E.sub_h(E.one_h(), ri), E.sub_h(E.one_h(), ci)),
        )
        eq_val = E.mul_h(eq_val, term)
    backend = VerifierBackend(E, alpha)
    sel_first, sel_last, sel_trans = boundary_evals_at(E, chs)

    def entry(kind, j):
        if kind == "local":
            return proof.final_local[j]
        if kind == "next":
            return proof.final_next[j]
        if kind == "is_transition":
            return sel_trans
        if kind == "is_first_row":
            return sel_first
        return sel_last

    b = _make_builder(
        backend, air.width, air.num_public_values, entry,
        lambda j: E.from_base_h(int(publics[j])),
    )
    air.eval(b)
    mask_sum = E.zero_h()
    basis = [tuple(1 if i == d else 0 for i in range(E.D))
             for d in range(E.D)]
    for comps in proof.mask_values:
        for d in range(E.D):
            mask_sum = E.add_h(mask_sum, E.mul_h(comps[d], basis[d]))
    final = E.add_h(
        E.mul_h(eps, E.mul_h(eq_val, backend.acc)), mask_sum
    )
    if final != claim:
        raise ValueError("MaskedFinalEvaluationMismatch")
    return chs
