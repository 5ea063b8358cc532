"""Vectorized Poseidon2 AIR: trace gen KATs, constraint checks, e2e proof.

Mirrors the reference's poseidon2-air test strategy: trace generation must
agree with the permutation (generation.rs), constraints must hold on a
valid trace and fail on a tampered one, and the full uni-stark pipeline
must round-trip (examples/src/tests.rs poseidon2 objective).
"""

import numpy as np
import pytest

from plonky3_tpu.air.api import check_constraints, get_symbolic_layout
from plonky3_tpu.fields import KoalaBearExt4
from plonky3_tpu.fields.params import KoalaBear
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.models.poseidon2_air import (
    Poseidon2VectorAir,
    generate_vectorized_trace,
)
from plonky3_tpu.stark.config import poseidon2_stark_config
from plonky3_tpu.stark.prover import prove
from plonky3_tpu.stark.verifier import verify

F = KoalaBear


@pytest.fixture(scope="module")
def air():
    return Poseidon2VectorAir(F, state_width=16, vector_len=2)


@pytest.fixture(scope="module")
def trace_and_outputs(air, ):
    rng = np.random.default_rng(7)
    inputs = F.rand_np(rng, (16, 16))
    import jax.numpy as jnp

    trace, out = generate_vectorized_trace(air, jnp.asarray(inputs))
    return np.asarray(trace), np.asarray(out), inputs


def test_trace_matches_permutation(air, trace_and_outputs):
    _, out, inputs = trace_and_outputs
    expect = np.asarray(air.perm.permute_device(inputs))
    np.testing.assert_array_equal(out, expect)


def test_trace_layout(air, trace_and_outputs):
    trace, out, inputs = trace_and_outputs
    V, C, W = air.V, air.cols_per_perm, air.W
    assert trace.shape == (8, V * C)
    perms = trace.reshape(16, C)
    # inputs occupy the first W columns of each block
    np.testing.assert_array_equal(perms[:, :W], inputs)
    # last full-round post == permutation output
    np.testing.assert_array_equal(perms[:, C - W :], out)


def test_constraints_hold(air, trace_and_outputs):
    trace, _, _ = trace_and_outputs
    trace_std = F.from_monty_np(trace)
    assert check_constraints(air, trace_std, []) == []


def test_constraint_count(air):
    n, deg = get_symbolic_layout(air)
    # V * (8 full rounds x 16 posts + 20 partial posts), REG=0 adds none
    assert n == air.V * (8 * 16 + air.PR)
    assert deg == 3


def test_tampered_trace_fails(air, trace_and_outputs):
    trace, _, _ = trace_and_outputs
    trace_std = F.from_monty_np(trace).copy()
    trace_std[3, air.W + 5] ^= 1  # corrupt a beginning-full-round post
    assert check_constraints(air, trace_std, []) != []


def test_specialized_fold_matches_generic(air, trace_and_outputs):
    """fold_constraints_device must be bit-identical to the generic
    ProverBackend emission (same constraints, same alpha assignment)."""
    import jax.numpy as jnp

    from plonky3_tpu.air.api import _make_builder
    from plonky3_tpu.air.builder import ProverBackend
    from plonky3_tpu.fields import KoalaBearExt4 as E

    trace, _, _ = trace_and_outputs
    rng = np.random.default_rng(11)
    local = jnp.asarray(F.rand_np(rng, trace.shape))
    n_cons, _ = get_symbolic_layout(air)
    alpha = tuple(int(x) for x in rng.integers(0, F.P, 4))
    alpha_pows = jnp.asarray(E.powers_np(alpha, n_cons)[::-1].copy())

    backend = ProverBackend(F, E, alpha_pows)
    builder = _make_builder(
        backend, air.width, 0,
        lambda kind, j: local[:, j] if kind == "local" else local[:, j],
        lambda j: None,
    )
    air.eval(builder)
    generic = np.asarray(backend.finalize((trace.shape[0],)))

    special = np.asarray(
        air.fold_constraints_device(F, E, local, local, {}, None, alpha_pows)
    )
    np.testing.assert_array_equal(special, generic)


def test_prove_verify_roundtrip(air, trace_and_outputs):
    import jax.numpy as jnp

    trace, _, _ = trace_and_outputs
    config = poseidon2_stark_config(
        F, KoalaBearExt4, FriParameters.new_testing()
    )
    proof = prove(config, air, jnp.asarray(trace), [])
    verify(config, air, proof, [])  # raises on failure
