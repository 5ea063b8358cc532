"""batch-stark: heterogeneous instances under one commitment
(batch-stark/tests/simple.rs model)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_tpu.fields import KoalaBearExt4
from plonky3_tpu.fields.params import KoalaBear as F
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.models.fibonacci import (
    FibonacciAir,
    generate_fibonacci_trace,
)
from plonky3_tpu.models.poseidon2_air import (
    Poseidon2VectorAir,
    generate_vectorized_trace,
)
from plonky3_tpu.stark.batch import (
    BatchInstance,
    prove_batch,
    verify_batch,
)
from plonky3_tpu.stark.config import poseidon2_stark_config
from plonky3_tpu.stark.verifier import VerificationError


@pytest.fixture(scope="module")
def setup(rng):
    config = poseidon2_stark_config(
        F, KoalaBearExt4, FriParameters.new_testing()
    )
    fib_air = FibonacciAir(F)
    rows4, pv4 = generate_fibonacci_trace(F, 4)
    rows6, pv6 = generate_fibonacci_trace(F, 6)
    p2_air = Poseidon2VectorAir(F, 16, vector_len=1)
    p2_trace, _ = generate_vectorized_trace(
        p2_air, jnp.asarray(F.rand_np(rng, (8, 16)))
    )
    instances = [
        BatchInstance(fib_air, jnp.asarray(F.to_monty_np(rows4)), pv4),
        BatchInstance(p2_air, p2_trace, []),
        BatchInstance(fib_air, jnp.asarray(F.to_monty_np(rows6)), pv6),
    ]
    return config, instances


# module-scope rng (conftest rng is function-scope)
@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0xBA7C4)


def test_batch_roundtrip(setup):
    config, instances = setup
    proof = prove_batch(config, instances)
    airs = [i.air for i in instances]
    pvs = [i.public_values for i in instances]
    verify_batch(config, airs, proof, pvs)


def test_batch_bad_publics_rejected(setup):
    config, instances = setup
    proof = prove_batch(config, instances)
    airs = [i.air for i in instances]
    pvs = [list(i.public_values) for i in instances]
    pvs[2][2] = (pvs[2][2] + 1) % F.P
    with pytest.raises(VerificationError):
        verify_batch(config, airs, proof, pvs)


def test_batch_tampered_opening_rejected(setup):
    config, instances = setup
    proof = prove_batch(config, instances)
    lo, nx = proof.opened_main[1]
    lo = list(lo)
    lo[3] = tuple((x + 1) % F.P for x in lo[3])
    proof.opened_main[1] = (lo, nx)
    airs = [i.air for i in instances]
    pvs = [i.public_values for i in instances]
    with pytest.raises(VerificationError):
        verify_batch(config, airs, proof, pvs)
