"""Monolith-M31 AIR: constraint satisfaction, cross-check vs the
KAT-validated permutation, tamper detection, circle-STARK e2e (model:
monolith-air/src/lib.rs tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_tpu.air.api import check_constraints
from plonky3_tpu.fields.mersenne31 import Mersenne31 as F
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.hashes.monolith import MonolithM31
from plonky3_tpu.models.monolith_air import (
    NUM_MONOLITH_COLS,
    MonolithAir,
    _post_off,
    generate_monolith_trace,
)
from plonky3_tpu.stark.config import circle_stark_config
from plonky3_tpu.stark.prover import prove
from plonky3_tpu.stark.verifier import VerificationError, verify

P = (1 << 31) - 1


def _inputs(rng, n):
    return rng.integers(0, P, size=(n, 16), dtype=np.uint64).astype(
        np.uint32
    )


def test_trace_satisfies_constraints():
    rng = np.random.default_rng(0)
    air = MonolithAir(F)
    trace = generate_monolith_trace(F, _inputs(rng, 4))
    assert trace.shape == (4, NUM_MONOLITH_COLS)
    failures = check_constraints(air, trace, [])
    assert failures == [], failures[:3]


def test_final_post_matches_permutation():
    rng = np.random.default_rng(1)
    n = 4
    inputs = _inputs(rng, n)
    trace = generate_monolith_trace(F, inputs)
    perm = MonolithM31()
    want = perm.permute_np(inputs)
    got = trace[:, _post_off(5) : _post_off(5) + 16]
    assert (got == want).all()


def test_tampered_trace_fails_constraints():
    rng = np.random.default_rng(2)
    air = MonolithAir(F)
    trace = generate_monolith_trace(F, _inputs(rng, 2))
    trace[1, _post_off(3) + 4] ^= 1
    assert check_constraints(air, trace, []) != []


@pytest.mark.slow
def test_monolith_air_circle_e2e():
    rng = np.random.default_rng(3)
    config = circle_stark_config(FriParameters.new_testing())
    air = MonolithAir(F)
    trace_std = generate_monolith_trace(F, _inputs(rng, 8))
    trace = jnp.asarray(trace_std)  # M31 wire form == canonical
    proof = prove(config, air, trace, [])
    verify(config, air, proof, [])
