"""Blake3 AIR: constraint satisfaction, cross-check vs the blake3
permutation implementation, and an e2e uni-stark round-trip
(model: blake3-air/src/air.rs tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_tpu.air.api import check_constraints
from plonky3_tpu.fields import KoalaBear as F, KoalaBearExt4 as E
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.hashes.blake3 import _compress_host
from plonky3_tpu.models.blake3_air import (
    Blake3Air,
    NUM_BLAKE3_COLS,
    OFF_OUT,
    generate_blake3_trace,
)
from plonky3_tpu.stark.config import poseidon2_stark_config
from plonky3_tpu.stark.prover import prove
from plonky3_tpu.stark.verifier import verify


def _inputs(rng, n):
    return rng.integers(0, 2**32, size=(n, 24), dtype=np.uint64).astype(
        np.uint32
    )


def test_trace_satisfies_constraints():
    rng = np.random.default_rng(0)
    air = Blake3Air(F)
    trace = generate_blake3_trace(F, _inputs(rng, 4))
    assert trace.shape == (4, NUM_BLAKE3_COLS)
    failures = check_constraints(air, trace, [])
    assert failures == [], failures[:3]


def test_outputs_match_blake3_permutation():
    """outputs[0..1] = state ^ state[8..], outputs[2..3] = state[8..] ^
    chaining — i.e. the full 16-word compression output
    (generation.rs:115-121 / blake3 spec)."""
    rng = np.random.default_rng(1)
    n = 2
    inputs = _inputs(rng, n)
    trace = generate_blake3_trace(F, inputs)
    for row in range(n):
        cv = [int(x) for x in inputs[row, 16:24]]
        block = [int(x) for x in inputs[row, :16]]
        out16 = _compress_host(cv, block, row, n, 0)
        got = []
        for i in range(16):
            bits = trace[row, OFF_OUT + 32 * i : OFF_OUT + 32 * (i + 1)]
            got.append(int(sum(int(b) << z for z, b in enumerate(bits))))
        assert got == [int(x) & 0xFFFFFFFF for x in out16]


def test_tampered_trace_fails_constraints():
    rng = np.random.default_rng(2)
    air = Blake3Air(F)
    trace = generate_blake3_trace(F, _inputs(rng, 2))
    trace[1, OFF_OUT + 3] ^= 1
    assert check_constraints(air, trace, []) != []


@pytest.mark.slow
def test_blake3_air_e2e():
    rng = np.random.default_rng(3)
    config = poseidon2_stark_config(F, E, FriParameters.new_testing())
    air = Blake3Air(F)
    trace_std = generate_blake3_trace(F, _inputs(rng, 8))
    trace = jnp.asarray(F.to_monty_np(trace_std))
    proof = prove(config, air, trace, [])
    verify(config, air, proof, [])
