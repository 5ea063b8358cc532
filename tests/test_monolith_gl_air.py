"""Monolith-Goldilocks AIR (monolith-air/src/air.rs:52-55 variant):
trace generation + exact constraint validation + tamper detection.
(End-to-end GL proving waits on the Goldilocks PCS device wiring;
fields/goldilocks_device.py carries the field kernels.)"""

import numpy as np

from plonky3_tpu.air.api import check_constraints
from plonky3_tpu.hashes.monolith import MonolithGoldilocks
from plonky3_tpu.models.monolith_gl_air import (
    NUM_MONOLITH_GL_COLS,
    MonolithGoldilocksAir,
    generate_monolith_gl_trace,
    _post_off,
    N_ROUNDS,
    WIDTH,
    P,
)


def test_monolith_gl_trace_and_constraints():
    rng = np.random.default_rng(0)
    n = 4
    inputs = np.array(
        [[int(x) for x in rng.integers(0, P, WIDTH, dtype=np.uint64)]
         for _ in range(n)], dtype=object,
    )
    air = MonolithGoldilocksAir()
    trace = generate_monolith_gl_trace(inputs)
    assert trace.shape == (n, NUM_MONOLITH_GL_COLS)
    # final round post == the host permutation output (KAT-backed impl)
    perm = MonolithGoldilocks(width=WIDTH)
    for row in range(n):
        want = perm.permute_host([int(x) for x in inputs[row]])
        got = [int(trace[row, _post_off(N_ROUNDS) + i])
               for i in range(WIDTH)]
        assert got == want
    assert check_constraints(air, trace, []) == []


def test_monolith_gl_tamper_detected():
    rng = np.random.default_rng(1)
    inputs = np.array(
        [[int(x) for x in rng.integers(0, P, WIDTH, dtype=np.uint64)]
         for _ in range(2)], dtype=object,
    )
    air = MonolithGoldilocksAir()
    trace = generate_monolith_gl_trace(inputs)
    trace[1, _post_off(2) + 3] = (int(trace[1, _post_off(2) + 3]) + 1) % P
    assert check_constraints(air, trace, []) != []
