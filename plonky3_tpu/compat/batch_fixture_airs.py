"""The batch-stark golden-fixture AIRs, reproduced exactly
(batch-stark/tests/simple.rs: MulAir/MulAirLookups :157-314,
FibonacciAir/FibAirLookups :40-130,345-430, traces :120-155,316-343)."""

from __future__ import annotations

import numpy as np

from ..air.api import BaseAir
from ..models.fibonacci import FibonacciAir


class MulAirLookups(BaseAir):
    """MulAir (reps Fibonacci-fed multiplications + a lut column) with
    optional local/global lookups (simple.rs:157-314)."""

    num_public_values = 0

    def __init__(self, field, reps: int = 2, is_local: bool = False,
                 is_global: bool = True, global_names=("MulFib", "MulFib")):
        self.field = field
        self.reps = reps
        self.is_local = is_local
        self.is_global = is_global
        self.global_names = list(global_names)
        self.width = reps * 3 + 1

    def eval(self, b):
        local, nxt = b.main.local, b.main.next
        for i in range(self.reps):
            s = i * 3
            a, bb, c = local[s], local[s + 1], local[s + 2]
            b.assert_eq(a * bb, c)
            b.when_transition().assert_eq(bb, nxt[s])
            b.when_transition().assert_eq(a + bb, nxt[s + 1])
        lut = local[self.width - 1]
        for rep in range(self.reps):
            a = local[rep * 3]
            bb = local[rep * 3 + 1]
            if self.is_local:
                # query (receive, +1) then table (send, -1) in one column
                b.push_local_interaction(
                    [([a], 1), ([lut], -1)], count_weight=1
                )
            if self.is_global:
                b.push_interaction(
                    self.global_names[rep], [a, bb], -1, count_weight=1
                )


def mul_trace(F, rows: int, reps: int = 2) -> np.ndarray:
    """simple.rs:316-343 — per rep: Fibonacci (a, b, a·b); the lut column
    holds b on every row but the last (which keeps zero)."""
    w = reps * 3 + 1
    v = np.zeros((rows, w), dtype=np.uint64)
    P = np.uint64(F.P)
    for rep in range(reps):
        a, b = np.uint64(0), np.uint64(1)
        for i in range(rows):
            v[i, rep * 3] = a
            v[i, rep * 3 + 1] = b
            v[i, rep * 3 + 2] = (a * b) % P
            if i != rows - 1:
                v[i, w - 1] = b
            a, b = b, (a + b) % P
    return v.astype(np.uint32)


class FibAirLookups(BaseAir):
    """FibonacciAir + preprocessed index column + optional global
    receive (simple.rs:345-430)."""

    width = 2
    num_public_values = 3

    def __init__(self, field, log_height: int, is_global: bool = True,
                 name_and_mult=None):
        self.field = field
        self.log_height = log_height
        self.inner = FibonacciAir(field)
        self.is_global = is_global
        self.name_and_mult = name_and_mult or ("MulFib", 2)

    def preprocessed_trace(self):
        n = 1 << self.log_height
        return np.arange(n, dtype=np.uint32).reshape(n, 1)

    def eval(self, b):
        self.inner.eval(b)
        if self.is_global:
            left, right = b.main.local[0], b.main.local[1]
            name, mult = self.name_and_mult
            b.push_interaction(
                name, [left, right], mult, count_weight=mult
            )
