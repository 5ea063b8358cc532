"""uni-stark over CirclePcs (M31): the reference's circle-STARK pipeline
(uni-stark/tests/fib_air.rs circle fixture path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_tpu.fields.mersenne31 import Mersenne31 as F
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.models.fibonacci import (
    FibonacciAir,
    generate_fibonacci_trace,
)
from plonky3_tpu.stark.config import circle_stark_config
from plonky3_tpu.stark.prover import prove
from plonky3_tpu.stark.verifier import VerificationError, verify


@pytest.fixture(scope="module")
def config():
    return circle_stark_config(FriParameters.new_testing())


def test_circle_fib_roundtrip(config):
    air = FibonacciAir(F)
    rows, publics = generate_fibonacci_trace(F, 5)
    trace = jnp.asarray(F.to_monty_np(rows))
    proof = prove(config, air, trace, publics)
    verify(config, air, proof, publics)


def test_circle_fib_bad_publics_rejected(config):
    air = FibonacciAir(F)
    rows, publics = generate_fibonacci_trace(F, 4)
    trace = jnp.asarray(F.to_monty_np(rows))
    proof = prove(config, air, trace, publics)
    bad = [publics[0], publics[1], (publics[2] + 1) % F.P]
    with pytest.raises(VerificationError):
        verify(config, air, proof, bad)
