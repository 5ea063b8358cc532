"""uni-stark over TrivialPcs — isolates STARK logic from FRI
(commit/src/testing.rs purpose)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_tpu.commit.trivial_pcs import TrivialPcs
from plonky3_tpu.fields import KoalaBearExt4
from plonky3_tpu.fields.params import KoalaBear as F
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.models.fibonacci import (
    FibonacciAir,
    generate_fibonacci_trace,
)
from plonky3_tpu.stark.config import StarkConfig
from plonky3_tpu.stark.prover import prove
from plonky3_tpu.stark.verifier import VerificationError, verify


@pytest.fixture(scope="module")
def config():
    pcs = TrivialPcs(
        F=F, E=KoalaBearExt4, fri=FriParameters.new_testing()
    )
    return StarkConfig(pcs=pcs)


def test_trivial_pcs_uni_stark(config):
    air = FibonacciAir(F)
    rows, publics = generate_fibonacci_trace(F, 4)
    trace = jnp.asarray(F.to_monty_np(rows))
    proof = prove(config, air, trace, publics)
    verify(config, air, proof, publics)
    bad = [publics[0], publics[1], (publics[2] + 1) % F.P]
    with pytest.raises(VerificationError):
        verify(config, air, proof, bad)
