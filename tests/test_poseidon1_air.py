"""Poseidon1 AIR: trace/permutation agreement, fold equivalence, e2e."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_tpu.air.api import check_constraints, get_symbolic_layout
from plonky3_tpu.fields import KoalaBearExt4 as E
from plonky3_tpu.fields.params import KoalaBear as F
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.models.poseidon1_air import (
    Poseidon1VectorAir,
    generate_vectorized_trace_p1,
)
from plonky3_tpu.stark.config import poseidon2_stark_config
from plonky3_tpu.stark.prover import prove
from plonky3_tpu.stark.verifier import verify


@pytest.fixture(scope="module")
def air():
    return Poseidon1VectorAir(F, 16, vector_len=2)


@pytest.fixture(scope="module")
def tr(air):
    rng = np.random.default_rng(11)
    inputs = rng.integers(0, F.P, size=(16, 16), dtype=np.uint32)
    trace, out = generate_vectorized_trace_p1(air, inputs)
    return trace, out, inputs


def test_trace_matches_permutation(air, tr):
    trace, out, inputs = tr
    expect = air.perm.permute_host([int(x) for x in inputs[5]])
    assert [int(x) for x in out[5]] == expect


def test_constraints_hold(air, tr):
    trace, _, _ = tr
    assert check_constraints(air, trace, []) == []
    bad = trace.copy()
    bad[2, air.W + 3] ^= 1
    assert check_constraints(air, bad, []) != []


def test_fold_matches_generic(air, tr):
    from plonky3_tpu.air.api import _make_builder
    from plonky3_tpu.air.builder import ProverBackend

    trace, _, _ = tr
    rng = np.random.default_rng(12)
    local = jnp.asarray(F.rand_np(rng, trace.shape))
    n_cons, _ = get_symbolic_layout(air)
    alpha = tuple(int(x) for x in rng.integers(0, F.P, 4))
    ap = jnp.asarray(E.powers_np(alpha, n_cons)[::-1].copy())
    backend = ProverBackend(F, E, ap)
    builder = _make_builder(
        backend, air.width, 0,
        lambda kind, j: local[:, j], lambda j: None,
    )
    air.eval(builder)
    generic = np.asarray(backend.finalize((trace.shape[0],)))
    special = np.asarray(
        air.fold_constraints_device(F, E, local, local, {}, None, ap)
    )
    np.testing.assert_array_equal(special, generic)


def test_prove_verify(air, tr):
    trace, _, _ = tr
    config = poseidon2_stark_config(F, E, FriParameters.new_testing())
    t = jnp.asarray(F.to_monty_np(trace))
    proof = prove(config, air, t, [])
    verify(config, air, proof, [])
