"""AIR composition utilities — SubAirBuilder / named / joined AIRs.

Mirrors `uni-stark/src/sub_builder.rs:45` (evaluate a component AIR
against a column slice of a larger trace, sharing the parent builder's
bookkeeping) and `air/src/named.rs:20-242` (namespaced constraint
labels for debugging; side-by-side joining of AIRs). These are how the
reference builds big AIRs out of gadget AIRs.
"""

from __future__ import annotations

from .api import BaseAir
from .builder import AirBuilder, RowWindow


def sub_builder(parent: AirBuilder, col_start: int, col_end: int
                ) -> AirBuilder:
    """A builder view exposing only main columns [col_start, col_end) to
    a sub-AIR; constraints, filters and interactions land in the parent
    (sub_builder.rs:45 SubAirBuilder)."""
    child = AirBuilder(
        parent.backend,
        RowWindow(
            local=parent.main.local[col_start:col_end],
            next=parent.main.next[col_start:col_end],
        ),
        parent.public_values,
        parent.is_first_row,
        parent.is_last_row,
        parent.is_transition,
    )
    child._filter = parent._filter
    child.interactions = parent.interactions
    child.periodic = getattr(parent, "periodic", [])
    return child


class NamedAir(BaseAir):
    """Attach a namespace label to an AIR (named.rs:20 NamedAir): debug
    backends report constraint failures under `<name>/<index>`; all
    other backends pass straight through."""

    def __init__(self, name: str, inner: BaseAir):
        self.name = name
        self.inner = inner
        self.field = inner.field
        self.width = inner.width
        self.num_public_values = inner.num_public_values

    def periodic_columns(self):
        return self.inner.periodic_columns()

    def main_next_row_columns(self):
        return self.inner.main_next_row_columns()

    def max_constraint_degree(self):
        return self.inner.max_constraint_degree()

    def eval(self, b):
        backend = b.backend
        push = getattr(backend, "push_namespace", None)
        if push is not None:
            push(self.name)
        try:
            self.inner.eval(b)
        finally:
            if push is not None:
                backend.pop_namespace()


class JoinedAir(BaseAir):
    """Two AIRs side by side in one trace (named.rs Joined): columns are
    [a | b], public values are a's then b's; each half evaluates through
    a SubAirBuilder over its own slice."""

    def __init__(self, a: BaseAir, b: BaseAir):
        self.a = a
        self.b = b
        self.field = a.field
        self.width = a.width + b.width
        self.num_public_values = (
            a.num_public_values + b.num_public_values
        )

    def max_constraint_degree(self):
        da = self.a.max_constraint_degree()
        db = self.b.max_constraint_degree()
        if da is None or db is None:
            return None
        return max(da, db)

    def eval(self, builder):
        ba = sub_builder(builder, 0, self.a.width)
        ba.public_values = builder.public_values[
            : self.a.num_public_values
        ]
        self.a.eval(ba)
        bb = sub_builder(builder, self.a.width, self.width)
        bb.public_values = builder.public_values[
            self.a.num_public_values :
        ]
        self.b.eval(bb)
