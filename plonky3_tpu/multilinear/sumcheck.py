"""Zerocheck via sumcheck — the `sumcheck` + `multi-stark` core.

Protocol (multi-stark/src/zerocheck.rs:121,217; sumcheck/src/strategy.rs):
prove that the AIR constraints C vanish on the whole hypercube by showing

    Σ_{x in H_n}  eq(r, x) · C(T(x), T(shift x)) = 0

for a verifier challenge r. Each sumcheck round binds the lowest unbound
variable: the prover sends the round polynomial evaluated at
t = 0..deg (deg = air degree + 1 for the eq factor); the verifier checks
p(0) + p(1) == claim, samples the round challenge, and continues with
claim = p(challenge) (Lagrange interpolation over {0..deg}).

Device realization: every column (trace MLEs, shifted-trace MLEs, eq
table) lives as a (2^m, D) ext array; a round evaluates C over the
affine extensions col_t = even + t·(odd - even) for each t — pure VPU
array code — and modular-sums. Binding at the ext challenge is the same
affine fold. No reference code shapes this: the per-t evaluation IS the
TPU-native replacement for the SVO accumulator machinery
(sumcheck/src/svo/) which exists to make CPU scalar loops cheap.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..air.api import _make_builder, get_symbolic_layout
from .mle import eq_table_device


def get_ml_layout(air):
    """(num_constraints, max multilinear degree): every builder entry —
    trace columns AND boundary selectors — is a degree-1 multilinear
    factor on the hypercube (multi-stark/src/selectors.rs: the selectors
    are the closed-form MLEs eq(x,0), eq(x,1), 1-eq(x,1))."""
    from ..air.api import _make_builder as _mb
    from ..air.builder import SymbolicBackend

    backend = SymbolicBackend()
    b = _mb(
        backend, air.width, air.num_public_values, lambda kind, j: 1,
        lambda j: 0,
        num_periodic=len(air.periodic_columns()),
        periodic_entry=lambda j: 1,
    )
    air.eval(b)
    degs = backend.constraint_degrees
    return len(degs), (max(degs) if degs else 0)


def selector_tables_device(E, num_vars: int):
    """Device (2^n, D) ext tables of the boundary selector MLEs
    sel_first = eq(x, 0..0) and sel_last = eq(x, 1..1)."""
    n = 1 << num_vars
    first = np.zeros((n, E.D), np.uint32)
    last = np.zeros((n, E.D), np.uint32)
    one_m = E.to_monty_np(E.one_h())
    first[0] = one_m
    last[n - 1] = one_m
    return jnp.asarray(first), jnp.asarray(last)


def boundary_evals_at(E, rs):
    """BoundaryEvals::at (selectors.rs:100): (first, last, transition)
    at the bound point rs."""
    first = E.one_h()
    last = E.one_h()
    for r in rs:
        first = E.mul_h(first, E.sub_h(E.one_h(), r))
        last = E.mul_h(last, r)
    return first, last, E.sub_h(E.one_h(), last)


class _ExtArrayBackend:
    """AIR eval backend over device EXT arrays (alpha-folded)."""

    def __init__(self, E, alpha_pows_m):
        self.E = E
        self.alpha_pows = alpha_pows_m  # (K, D) device monty
        self.idx = 0
        self.acc = None

    def const(self, c):
        t = self.E.to_monty_np(self.E.from_base_h(int(c)))
        return jnp.asarray(t)

    def add(self, a, b):
        return self.E.add(a, b)

    def sub(self, a, b):
        return self.E.sub(a, b)

    def mul(self, a, b):
        return self.E.mul(a, b)

    def neg(self, a):
        return self.E.neg(a)

    def emit(self, c):
        ap = self.alpha_pows[self.idx]
        self.idx += 1
        term = self.E.mul(c, ap)
        self.acc = term if self.acc is None else self.E.add(self.acc, term)


def _eval_constraints(E, air, cols_local, cols_next, publics, alpha_pows_m,
                      sel_first=None, sel_last=None):
    """Alpha-folded constraint values over (N, D) ext arrays.

    Boundary selectors are the closed-form MLE columns (eq(x,0),
    eq(x,1), 1-eq(x,1)) — degree-1 multilinear factors that fold along
    with the trace columns (multi-stark/src/selectors.rs)."""
    backend = _ExtArrayBackend(E, alpha_pows_m)
    one = backend.const(1)
    zero = backend.const(0)

    def entry(kind, j):
        if kind == "local":
            return cols_local[j]
        if kind == "next":
            return cols_next[j]
        if kind == "is_transition":
            return (
                E.sub(jnp.broadcast_to(one, sel_last.shape), sel_last)
                if sel_last is not None else one
            )
        if kind == "is_first_row":
            return sel_first if sel_first is not None else zero
        return sel_last if sel_last is not None else zero  # is_last_row

    builder = _make_builder(
        backend, air.width, air.num_public_values, entry,
        lambda j: backend.const(publics[j]),
    )
    air.eval(builder)
    return backend.acc  # (N, D)


@dataclass
class SumcheckProof:
    round_polys: list  # [round] -> [deg+1 ext tuples] evals at t=0..deg


def _fold_t(E, col, t):
    """col (2m, D) -> (m, D): even + t·(odd - even), t a small int."""
    m = col.shape[0] // 2
    v = col.reshape(m, 2, E.D)
    even, odd = v[:, 0], v[:, 1]
    if t == 0:
        return even
    if t == 1:
        return odd
    diff = E.sub(odd, even)
    tm = jnp.asarray(E.to_monty_np(E.from_base_h(t)))
    return E.add(even, E.mul(diff, tm))


def _fold_ext(E, col, ch):
    m = col.shape[0] // 2
    v = col.reshape(m, 2, E.D)
    even, odd = v[:, 0], v[:, 1]
    chm = jnp.asarray(E.to_monty_np(ch))
    return E.add(even, E.mul(E.sub(odd, even), chm))


def _lagrange_at(E, ys, z):
    """Interpolate points (i, ys[i]) i=0..d at z (host exact)."""
    d = len(ys) - 1
    acc = E.zero_h()
    for i in range(d + 1):
        num = E.one_h()
        den = 1
        for j in range(d + 1):
            if j == i:
                continue
            num = E.mul_h(num, E.sub_h(z, E.from_base_h(j)))
            den = (den * (i - j)) % E.base.P
        term = E.mul_h(ys[i], E.base_mul_h(E.base.inv_h(den % E.base.P), num))
        acc = E.add_h(acc, term)
    return acc


def prove_zerocheck(E, air, trace_std, publics, challenger):
    """trace_std: (n, w) numpy standard form, n = 2^num_vars rows.

    The AIR's transition constraints are enforced cyclically (next row
    wraps, matching check_constraints semantics); first/last-row
    constraints are gated by the boundary-selector MLEs (selectors.rs),
    which fold through the sumcheck like any other multilinear column
    and are evaluated in closed form by the verifier. Returns
    (SumcheckProof, final point r', claimed [local, next] MLE
    openings at r')."""
    F = E.base
    n, w = trace_std.shape
    num_vars = n.bit_length() - 1
    n_cons, max_deg = get_ml_layout(air)
    deg_round = max_deg + 1  # eq factor adds one

    r = [challenger.sample_ext(E.D) for _ in range(num_vars)]
    alpha = challenger.sample_ext(E.D)
    alpha_pows = [E.one_h()]
    for _ in range(n_cons - 1):
        alpha_pows.append(E.mul_h(alpha_pows[-1], alpha))
    ap_m = jnp.asarray(
        np.stack([E.to_monty_np(a) for a in reversed(alpha_pows)])
    )

    # ext-lifted device columns
    tr_m = F.to_monty_np(trace_std)
    shifted = np.roll(trace_std, -1, axis=0)
    sh_m = F.to_monty_np(shifted)

    def lift(mat):
        z = np.zeros(mat.shape + (E.D,), np.uint32)
        z[..., 0] = mat
        return jnp.asarray(z)

    cols_local = [lift(tr_m[:, j]) for j in range(w)]
    cols_next = [lift(sh_m[:, j]) for j in range(w)]
    eq = eq_table_device(E, r)
    sel_first, sel_last = selector_tables_device(E, num_vars)

    round_polys = []
    chs = []
    claim = E.zero_h()
    for rnd in range(num_vars):
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
            s = F.sum(total, axis=0)  # (D,) componentwise modular sum
            evals_t.append(
                tuple(int(x) for x in F.from_monty_np(np.asarray(s)))
            )
        round_polys.append(evals_t)
        for y in evals_t:
            challenger.observe_ext(y)
        ch = challenger.sample_ext(E.D)
        chs.append(ch)
        cols_local = [_fold_ext(E, c, ch) for c in cols_local]
        cols_next = [_fold_ext(E, c, ch) for c in cols_next]
        eq = _fold_ext(E, eq, ch)
        sel_first = _fold_ext(E, sel_first, ch)
        sel_last = _fold_ext(E, sel_last, ch)
        claim = _lagrange_at(E, evals_t, ch)

    final_local = [
        tuple(int(x) for x in F.from_monty_np(np.asarray(c[0])))
        for c in cols_local
    ]
    final_next = [
        tuple(int(x) for x in F.from_monty_np(np.asarray(c[0])))
        for c in cols_next
    ]
    return SumcheckProof(round_polys=round_polys), final_local, final_next, chs


def verify_zerocheck(E, air, num_vars, publics, proof: SumcheckProof,
                     final_local, final_next, challenger):
    """Replays the transcript; returns the bound point (challenges) after
    checking the sumcheck chain and the final constraint evaluation
    against the claimed MLE openings. Raises ValueError on failure."""
    from ..air.builder import VerifierBackend

    F = E.base
    n_cons, max_deg = get_ml_layout(air)
    deg_round = max_deg + 1
    r = [challenger.sample_ext(E.D) for _ in range(num_vars)]
    alpha = challenger.sample_ext(E.D)

    if len(proof.round_polys) != num_vars:
        raise ValueError("RoundCountMismatch")
    claim = E.zero_h()
    chs = []
    for rnd, evals_t in enumerate(proof.round_polys):
        if len(evals_t) != deg_round + 1:
            raise ValueError("RoundPolyDegreeMismatch")
        if E.add_h(evals_t[0], evals_t[1]) != claim:
            raise ValueError(f"SumcheckRoundMismatch round {rnd}")
        for y in evals_t:
            challenger.observe_ext(y)
        ch = challenger.sample_ext(E.D)
        chs.append(ch)
        claim = _lagrange_at(E, evals_t, ch)

    # eq(r, chs)
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
            return final_local[j]
        if kind == "next":
            return final_next[j]
        if kind == "is_transition":
            return sel_trans
        if kind == "is_first_row":
            return sel_first
        return sel_last  # is_last_row

    builder = _make_builder(
        backend, air.width, air.num_public_values, entry,
        lambda j: E.from_base_h(publics[j]),
    )
    air.eval(builder)
    if E.mul_h(eq_val, backend.acc) != claim:
        raise ValueError("FinalEvaluationMismatch")
    return chs
