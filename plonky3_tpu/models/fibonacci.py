"""Fibonacci AIR — the minimal end-to-end workload
(model: uni-stark/tests/fib_air.rs).

Columns: (left, right). Public values: (a, b, x) with x the claimed final
right value. Constraints:
  first row:  left = a, right = b
  transition: next.left = right, next.right = left + right
  last row:   right = x
"""

from __future__ import annotations

import numpy as np

from ..air.api import BaseAir


class FibonacciAir(BaseAir):
    width = 2
    num_public_values = 3

    def __init__(self, field):
        self.field = field

    def max_constraint_degree(self):
        return 2  # filtered transition constraints: selector(1) × linear(1)

    def eval(self, b):
        a, bb, x = b.public_values
        local, nxt = b.main.local, b.main.next
        first = b.when_first_row()
        first.assert_eq(local[0], a)
        first.assert_eq(local[1], bb)
        trans = b.when_transition()
        # operand order matches fib_air.rs:63-68 exactly — the folded
        # constraint value (hence the quotient) is sign-sensitive
        trans.assert_eq(local[1], nxt[0])
        trans.assert_eq(local[0] + local[1], nxt[1])
        b.when_last_row().assert_eq(local[1], x)


def generate_fibonacci_trace(F, log_n: int, a: int = 0, b: int = 1):
    """(n, 2) standard-form numpy trace + public values [a, b, final]."""
    n = 1 << log_n
    rows = np.zeros((n, 2), dtype=np.uint64)
    x, y = a % F.P, b % F.P
    for i in range(n):
        rows[i] = (x, y)
        x, y = y, (x + y) % F.P
    publics = [a % F.P, b % F.P, int(rows[-1, 1])]
    return rows.astype(np.uint32), publics
