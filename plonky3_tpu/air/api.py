"""AIR base class + the evaluation entry points (symbolic / debug).

Mirrors `air/src/air.rs:9` (BaseAir: width, public values) and the symbolic
pass (`air/src/symbolic/builder.rs:105,166`) / debug constraint checker
(`air/src/check_constraints.rs:429`).
"""

from __future__ import annotations

import numpy as np

from ..utils.bits import log2_ceil
from .builder import (
    AirBuilder,
    DebugBackend,
    RowWindow,
    Sym,
    SymbolicBackend,
)


class BaseAir:
    """Subclass and implement `eval(self, builder)`; set `width`."""

    width: int = 0
    num_public_values: int = 0

    def eval(self, builder: AirBuilder):
        raise NotImplementedError

    def max_constraint_degree(self):
        """Optional hint (air/src/air.rs); None = infer symbolically."""
        return None

    def periodic_columns(self):
        """Periodic table data (air/src/air.rs:36-62): lists of std-form
        ints, each a power-of-two length dividing the trace length; both
        sides derive the values, nothing is committed."""
        return []

    def main_next_row_columns(self):
        """Columns whose next-row entries the constraints read
        (air/src/air.rs:102+). None = all (open at zeta AND zeta_next);
        an empty list lets the prover/verifier open main at zeta only."""
        return None


def _make_builder(backend, width, num_public, entry, public_entry,
                  num_periodic=0, periodic_entry=None):
    main = RowWindow(
        local=[Sym(backend, entry("local", j)) for j in range(width)],
        next=[Sym(backend, entry("next", j)) for j in range(width)],
    )
    publics = [Sym(backend, public_entry(j)) for j in range(num_public)]
    b = AirBuilder(
        backend,
        main,
        publics,
        is_first_row=Sym(backend, entry("is_first_row", 0)),
        is_last_row=Sym(backend, entry("is_last_row", 0)),
        is_transition=Sym(backend, entry("is_transition", 0)),
    )
    # periodic columns (air/src/air.rs:28-99): derived public values,
    # never committed; exposed as builder.periodic[j]
    b.periodic = [
        Sym(backend, periodic_entry(j)) for j in range(num_periodic)
    ] if periodic_entry is not None else []
    return b


_LAYOUT_CACHE: dict = {}


def get_symbolic_layout(air: BaseAir):
    """(num_constraints, max_degree) via degree tracing (cached per AIR
    instance — the 1312-column symbolic pass costs ~40 ms per call and
    sat on every prove's critical path)."""
    key = id(air)
    hit = _LAYOUT_CACHE.get(key)
    if hit is not None and hit[0] is air:
        return hit[1]
    backend = SymbolicBackend()

    def entry(kind, j):
        return 0 if kind == "is_transition" else 1

    builder = _make_builder(
        backend, air.width, air.num_public_values, entry, lambda j: 0,
        num_periodic=len(air.periodic_columns()),
        periodic_entry=lambda j: 1,  # degree of f(X^r) < n
    )
    air.eval(builder)
    degs = backend.constraint_degrees
    out = (len(degs), (max(degs) if degs else 0))
    _LAYOUT_CACHE[key] = (air, out)
    return out


def get_log_num_quotient_chunks(air: BaseAir) -> int:
    """uni-stark/src/symbolic.rs:10: log2_ceil(max(deg, 2) - 1)."""
    hint = air.max_constraint_degree()
    if hint is None:
        _, hint = get_symbolic_layout(air)
    degree = max(hint, 2)
    return log2_ceil(max(degree - 1, 1))


def check_constraints(air: BaseAir, trace_std: np.ndarray, public_values):
    """Debug full-trace constraint check; returns failure list (empty=ok).

    trace_std: (n, width) standard-form numpy; next row wraps (the
    is_transition filter masks the wrap, check_constraints.rs semantics).
    """
    n = trace_std.shape[0]
    backend = DebugBackend(F=air.field, n_rows=n)
    # object dtype for >32-bit fields (Goldilocks): uint64 products wrap
    dt = object if air.field.P > 0xFFFFFFFF else np.uint64
    tr = trace_std.astype(dt)
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

    pcols = air.periodic_columns()
    builder = _make_builder(
        backend, air.width, air.num_public_values, entry,
        lambda j: np.full(n, public_values[j] % air.field.P, dt),
        num_periodic=len(pcols),
        periodic_entry=lambda j: np.asarray(
            [pcols[j][i % len(pcols[j])] for i in range(n)], np.uint64
        ),
    )
    air.eval(builder)
    return backend.failures
