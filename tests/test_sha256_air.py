"""SHA-256 AIR: constraint satisfaction, cross-check vs the sha256
compression, tamper detection, e2e (model: sha256-air/src tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_tpu.air.api import check_constraints
from plonky3_tpu.fields import KoalaBear as F, KoalaBearExt4 as E
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.hashes.sha256 import sha256_compress
from plonky3_tpu.models.sha256_air import (
    NUM_SHA256_COLS,
    OFF_H_OUT,
    Sha256Air,
    generate_sha256_trace,
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
    air = Sha256Air(F)
    trace = generate_sha256_trace(F, _inputs(rng, 4))
    assert trace.shape == (4, NUM_SHA256_COLS)
    failures = check_constraints(air, trace, [])
    assert failures == [], failures[:3]


def test_h_out_matches_sha256_compress():
    rng = np.random.default_rng(1)
    n = 2
    inputs = _inputs(rng, n)
    trace = generate_sha256_trace(F, inputs)
    for row in range(n):
        state = [int(x) for x in inputs[row, 16:24]]
        block = [int(x) for x in inputs[row, :16]]
        want = sha256_compress(state, block)
        got = []
        for i in range(8):
            bits = trace[
                row, OFF_H_OUT + 32 * i : OFF_H_OUT + 32 * (i + 1)
            ]
            got.append(int(sum(int(b) << z for z, b in enumerate(bits))))
        assert got == [int(x) & 0xFFFFFFFF for x in want]


def test_tampered_trace_fails_constraints():
    rng = np.random.default_rng(2)
    air = Sha256Air(F)
    trace = generate_sha256_trace(F, _inputs(rng, 2))
    trace[0, OFF_H_OUT + 5] ^= 1
    assert check_constraints(air, trace, []) != []


@pytest.mark.slow
def test_sha256_air_e2e():
    rng = np.random.default_rng(3)
    config = poseidon2_stark_config(F, E, FriParameters.new_testing())
    air = Sha256Air(F)
    trace_std = generate_sha256_trace(F, _inputs(rng, 8))
    trace = jnp.asarray(F.to_monty_np(trace_std))
    proof = prove(config, air, trace, [])
    verify(config, air, proof, [])
