"""AIR definition DSL, generic over evaluation backends.

The reference expresses AIRs as `Air::eval(builder)` over an `AirBuilder`
trait (`air/src/builder.rs:12-211`) and re-runs the same eval with different
element types: symbolic (degree analysis), packed (prover quotient), single
extension point (verifier), debug rows. Here the same python `eval` runs
with four backends — the jax-native realization of that design (tracing IS
symbolic evaluation, SURVEY.md §7 design stance):

  * SymbolicBackend — values are polynomial degrees (in units of the trace
    length); counts constraints and the max degree
    (air/src/symbolic/builder.rs:105,166 semantics: entries/is_first/
    is_last have degree 1, is_transition degree 0, constants 0).
  * ProverBackend  — values are device base-field arrays over the whole
    quotient domain (the TPU "packing width" is the entire domain); folds
    constraints with descending alpha powers as they are emitted
    (uni-stark/src/folder.rs:98: C_fold = Σ α^{K-1-i}·C_i).
  * VerifierBackend — values are extension tuples at ζ; Horner fold
    acc = acc·α + C (uni-stark/src/verifier.rs verify_constraints).
  * DebugBackend — numpy row-wise exact check with failure reporting
    (air/src/check_constraints.rs:429).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


class Sym:
    """Backend-tagged expression wrapper with operator overloads."""

    __slots__ = ("b", "v")

    def __init__(self, backend, value):
        self.b = backend
        self.v = value

    def _lift(self, other):
        if isinstance(other, Sym):
            return other.v
        return self.b.const(int(other))

    def __add__(self, o):
        return Sym(self.b, self.b.add(self.v, self._lift(o)))

    __radd__ = __add__

    def __sub__(self, o):
        return Sym(self.b, self.b.sub(self.v, self._lift(o)))

    def __rsub__(self, o):
        return Sym(self.b, self.b.sub(self._lift(o), self.v))

    def __mul__(self, o):
        return Sym(self.b, self.b.mul(self.v, self._lift(o)))

    __rmul__ = __mul__

    def __neg__(self):
        return Sym(self.b, self.b.neg(self.v))


def stack_syms(syms):
    """Stack Syms into one vector Sym (leading axis = len(syms)).

    The TPU-native move for wide AIRs (e.g. vectorized Poseidon2, 1312
    columns): per-lane constraints become single array ops in the prover
    backend instead of thousands of scalar graph nodes.
    """
    b = syms[0].b
    return Sym(b, b.stack([s.v for s in syms]))


def _ew(op, a, b):
    """Elementwise op over possibly-nested list values (host backends)."""
    la, lb = isinstance(a, list), isinstance(b, list)
    if la or lb:
        if not la:
            a = [a] * len(b)
        if not lb:
            b = [b] * len(a)
        return [_ew(op, x, y) for x, y in zip(a, b)]
    return op(a, b)


def _flatten(v, out):
    if isinstance(v, list):
        for x in v:
            _flatten(x, out)
    else:
        out.append(v)
    return out


@dataclass
class RowWindow:
    local: list  # [Sym] width entries of the current row
    next: list  # [Sym] width entries of the next row


class AirBuilder:
    """The object handed to `air.eval`."""

    def __init__(self, backend, main: RowWindow, public_values,
                 is_first_row, is_last_row, is_transition):
        self.backend = backend
        self.main = main
        self.public_values = public_values  # [Sym]
        self.is_first_row = is_first_row  # Sym
        self.is_last_row = is_last_row
        self.is_transition = is_transition
        self._filter = None  # optional Sym multiplied into constraints
        # bus interactions recorded during eval (lookup/src/builder.rs
        # InteractionBuilder): each entry is a dict with bus name, field
        # Syms, count Sym, and the per-row count-magnitude bound. The
        # list is shared with when()-children so gated pushes land in
        # the root record.
        self.interactions = []

    # -- constraint emission ------------------------------------------
    def assert_zero(self, x):
        if not isinstance(x, Sym):
            x = Sym(self.backend, self.backend.const(int(x)))
        if self._filter is not None:
            x = self._filter * x
        self.backend.emit(x.v)

    def assert_eq(self, a, b):
        self.assert_zero(a - b)

    def assert_one(self, x):
        self.assert_zero(x - 1)

    def assert_bool(self, x):
        self.assert_zero(x * (x - 1))

    def assert_zero_ext(self, comps):
        """Emit ONE extension-field constraint from D component Syms
        (air/src/builder.rs ExtensionBuilder::assert_zero_ext — an ext
        constraint consumes a single alpha power)."""
        comps = [
            c if isinstance(c, Sym)
            else Sym(self.backend, self.backend.const(int(c)))
            for c in comps
        ]
        if self._filter is not None:
            comps = [self._filter * c for c in comps]
        self.backend.emit_ext([c.v for c in comps])

    def assert_zero_block(self, x: Sym, count: int):
        """Emit `count` constraints at once from a vector Sym (row-major
        over its stacked leading axes)."""
        if self._filter is not None:
            x = self._filter * x
        self.backend.emit_block(x.v, count)

    def assert_eq_block(self, a: Sym, b: Sym, count: int):
        self.assert_zero_block(a - b, count)

    # -- filtering (air/src/builder.rs when_* family) ------------------
    def when(self, condition) -> "AirBuilder":
        child = AirBuilder(
            self.backend, self.main, self.public_values,
            self.is_first_row, self.is_last_row, self.is_transition,
        )
        child._filter = (
            condition if self._filter is None else self._filter * condition
        )
        child.interactions = self.interactions
        return child

    # -- bus interactions (lookup/src/builder.rs push_interaction) -----
    def push_interaction(self, bus_name, fields, count, count_weight=1,
                         kind="global"):
        """Record one message on a named bus. A when()-filter gates the
        count (an inactive row emits nothing)."""

        def lift(x):
            if isinstance(x, Sym):
                return x
            return Sym(self.backend, self.backend.const(int(x)))

        count = lift(count)
        if self._filter is not None:
            count = self._filter * count
        self.interactions.append(
            dict(
                bus=bus_name,
                kind=kind,
                fields=[lift(f) for f in fields],
                count=count,
                count_weight=count_weight,
            )
        )

    def push_local_interaction(self, pairs, count_weight=1):
        """A LOCAL lookup (lookup/src/builder.rs push_local_interaction):
        one column holding the combined sum of several (tuple, count)
        fractions on a private bus; counts typically cancel within the
        instance (query +1, table -1)."""

        def lift(x):
            if isinstance(x, Sym):
                return x
            return Sym(self.backend, self.backend.const(int(x)))

        tuples, counts = [], []
        for fields, count in pairs:
            count = lift(count)
            if self._filter is not None:
                count = self._filter * count
            tuples.append([lift(f) for f in fields])
            counts.append(count)
        self.interactions.append(
            dict(
                bus=None,
                kind="local",
                tuples=tuples,
                counts=counts,
                count_weight=count_weight,
            )
        )

    def when_first_row(self):
        return self.when(self.is_first_row)

    def when_last_row(self):
        return self.when(self.is_last_row)

    def when_transition(self):
        return self.when(self.is_transition)


# ----------------------------------------------------------------------
# backends
# ----------------------------------------------------------------------
class SymbolicBackend:
    """Degree arithmetic + constraint counting."""

    def __init__(self):
        self.constraint_degrees = []

    def const(self, c):
        return 0

    def const_vec(self, values):
        return [0] * len(values)

    def add(self, a, b):
        return _ew(max, a, b)

    sub = add

    def mul(self, a, b):
        return _ew(lambda x, y: x + y, a, b)

    def neg(self, a):
        return a

    def emit(self, deg):
        self.constraint_degrees.append(deg)

    def emit_ext(self, comps):
        self.constraint_degrees.append(max(comps))

    def stack(self, vals):
        return list(vals)

    def emit_block(self, v, count):
        flat = _flatten(v, [])
        assert len(flat) == count
        self.constraint_degrees.extend(flat)


class ProverBackend:
    """Device base arrays over the quotient domain; eager alpha folding.

    `alpha_pows` is a (K, D) uint32 Monty array — descending powers, so
    constraint i gets alpha^{K-1-i} (folder.rs:98). It may be a traced
    value: the whole quotient pass jits as one program.
    """

    def __init__(self, F, E, alpha_pows):
        self.F, self.E = F, E
        self.alpha_pows = alpha_pows  # (K, D) uint32 monty
        self.idx = 0
        self.acc = None  # list of D arrays

    def const(self, c):
        return self.F.const(c)

    def const_vec(self, values):
        # (L, 1): broadcasts against lane-stacked (L, Nq) values
        import numpy as _np

        return jnp.asarray(
            self.F.to_monty_np(
                _np.asarray(values, dtype=_np.uint64).astype(_np.uint32)
            ).reshape(-1, 1)
        )

    def add(self, a, b):
        return self.F.add(a, b)

    def sub(self, a, b):
        return self.F.sub(a, b)

    def mul(self, a, b):
        return self.F.mul(a, b)

    def neg(self, a):
        return self.F.neg(a)

    def emit(self, c):
        ap = self.alpha_pows[self.idx]
        self.idx += 1
        terms = [self.F.mul(c, ap[d]) for d in range(self.E.D)]
        if self.acc is None:
            self.acc = terms
        else:
            self.acc = [self.F.add(a, t) for a, t in zip(self.acc, terms)]

    def emit_ext(self, comps):
        """One EXT constraint: comps are the D basis-coordinate arrays;
        the constraint folds with a single alpha power (ext·ext mul)."""
        ap = self.alpha_pows[self.idx]  # (D,)
        self.idx += 1
        shape = jnp.broadcast_shapes(*[jnp.shape(c) for c in comps])
        c = jnp.stack(
            [jnp.broadcast_to(x, shape) for x in comps], axis=-1
        )  # (..., D)
        term = self.E.mul(c, jnp.broadcast_to(ap, c.shape))
        terms = [term[..., d] for d in range(self.E.D)]
        if self.acc is None:
            self.acc = terms
        else:
            self.acc = [self.F.add(a, t) for a, t in zip(self.acc, terms)]

    def stack(self, vals):
        return jnp.stack([jnp.broadcast_to(v, jnp.broadcast_shapes(
            *[jnp.shape(x) for x in vals])) for v in vals], axis=0)

    def emit_block(self, v, count):
        """v: (..., Nq) with leading axes flattening to `count` constraints;
        constraint k gets alpha power idx+k (row-major), one batched
        mul-reduce per extension coordinate."""
        flat = v.reshape(count, v.shape[-1])  # (K, Nq)
        ap = jnp.asarray(self.alpha_pows[self.idx : self.idx + count])
        self.idx += count
        terms = [
            self.F.sum(self.F.mul(flat, ap[:, d][:, None]), axis=0)
            for d in range(self.E.D)
        ]
        if self.acc is None:
            self.acc = terms
        else:
            self.acc = [self.F.add(a, t) for a, t in zip(self.acc, terms)]

    def finalize(self, shape):
        if self.acc is None:
            return jnp.zeros(tuple(shape) + (self.E.D,), jnp.uint32)
        return jnp.stack(
            [jnp.broadcast_to(a, shape) for a in self.acc], axis=-1
        )


class VerifierBackend:
    """Extension tuples at a single out-of-domain point; Horner fold."""

    def __init__(self, E, alpha_host):
        self.E = E
        self.alpha = alpha_host
        self.acc = E.zero_h()

    def const(self, c):
        return self.E.from_base_h(c)

    def const_vec(self, values):
        return [self.E.from_base_h(int(v)) for v in values]

    def add(self, a, b):
        return _ew(self.E.add_h, a, b)

    def sub(self, a, b):
        return _ew(self.E.sub_h, a, b)

    def mul(self, a, b):
        return _ew(self.E.mul_h, a, b)

    def neg(self, a):
        return _ew(lambda x, _: self.E.neg_h(x), a, a)

    def emit(self, c):
        self.acc = self.E.add_h(self.E.mul_h(self.acc, self.alpha), c)

    def emit_ext(self, comps):
        """One EXT constraint from D basis-coordinate values (each an ext
        value at zeta): value = Σ_d comps[d]·basis_d."""
        val = self.E.zero_h()
        for d, c in enumerate(comps):
            basis = [0] * self.E.D
            basis[d] = 1
            val = self.E.add_h(val, self.E.mul_h(c, tuple(basis)))
        self.emit(val)

    def stack(self, vals):
        return list(vals)

    def emit_block(self, v, count):
        flat = _flatten(v, [])
        assert len(flat) == count
        for c in flat:
            self.emit(c)


class DebugBackend:
    """Numpy exact per-row evaluation with failure reports.

    Fields wider than 32 bits (Goldilocks) switch to object-dtype
    arrays: uint64 products would wrap, python ints are exact."""

    def __init__(self, F, n_rows):
        self.F = F
        self.n = n_rows
        self.failures = []
        self.idx = 0
        self._namespaces = []
        self.big = F.P > 0xFFFFFFFF

    # namespaced constraint labels (air/src/named.rs NamedAirBuilder):
    # failures report under "a/b/<index>"
    def push_namespace(self, name):
        self._namespaces.append(str(name))

    def pop_namespace(self):
        self._namespaces.pop()

    def _label(self):
        if not self._namespaces:
            return self.idx
        return "/".join(self._namespaces) + f"/{self.idx}"

    def const(self, c):
        if self.big:
            return np.full(self.n, int(c) % self.F.P, dtype=object)
        return np.full(self.n, c % self.F.P, dtype=np.uint64)

    def const_vec(self, values):
        # lane-stacked values are LISTS here (stack = list), so the
        # constant vector is one broadcastable scalar per lane
        if self.big:
            return [int(v) % self.F.P for v in values]
        return [np.uint64(int(v) % self.F.P) for v in values]

    def add(self, a, b):
        if self.big:
            return _ew(lambda x, y: (x + y) % self.F.P, a, b)
        return _ew(lambda x, y: (x + y) % np.uint64(self.F.P), a, b)

    def sub(self, a, b):
        if self.big:
            return _ew(lambda x, y: (x - y) % self.F.P, a, b)
        return _ew(
            lambda x, y: (x + np.uint64(self.F.P) - y) % np.uint64(self.F.P),
            a, b,
        )

    def mul(self, a, b):
        if self.big:
            return _ew(lambda x, y: (x * y) % self.F.P, a, b)
        return _ew(lambda x, y: (x * y) % np.uint64(self.F.P), a, b)

    def neg(self, a):
        if self.big:
            return _ew(lambda x, _: (-x) % self.F.P, a, a)
        return _ew(
            lambda x, _: (np.uint64(self.F.P) - x) % np.uint64(self.F.P),
            a, a,
        )

    def emit(self, c):
        bad = np.nonzero(c != 0)[0]
        if bad.size:
            self.failures.append(
                dict(constraint=self._label(), rows=bad[:10].tolist())
            )
        self.idx += 1

    def emit_ext(self, comps):
        bad = None
        for c in comps:
            b = np.asarray(c) != 0
            bad = b if bad is None else (bad | b)
        rows = np.nonzero(bad)[0]
        if rows.size:
            self.failures.append(
                dict(constraint=self._label(), rows=rows[:10].tolist())
            )
        self.idx += 1

    def stack(self, vals):
        return list(vals)

    def emit_block(self, v, count):
        flat = _flatten(v, [])
        assert len(flat) == count
        for c in flat:
            self.emit(np.broadcast_to(c, (self.n,)))
