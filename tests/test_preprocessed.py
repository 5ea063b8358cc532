"""Preprocessed traces (uni-stark/src/preprocessed.rs model): a selector
column fixed at setup drives constraints on the main trace."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_tpu.air.api import BaseAir
from plonky3_tpu.fields import KoalaBearExt4
from plonky3_tpu.fields.params import KoalaBear as F
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.stark.config import poseidon2_stark_config
from plonky3_tpu.stark.preprocessed import (
    prove_with_preprocessed,
    setup_preprocessed,
    verify_with_preprocessed,
)
from plonky3_tpu.stark.verifier import VerificationError


class EvenZeroAir(BaseAir):
    """Main column must be zero wherever the preprocessed selector is 1
    (the selector marks even rows, fixed at setup)."""

    width = 1
    num_public_values = 0

    def __init__(self, field):
        self.field = field

    def preprocessed_trace(self, log_n):
        n = 1 << log_n
        sel = np.zeros((n, 1), dtype=np.uint32)
        sel[::2, 0] = 1
        return sel

    def eval(self, b):
        sel = b.preprocessed.local[0]
        b.assert_zero(sel * b.main.local[0])


def _trace(log_n, rng):
    n = 1 << log_n
    t = rng.integers(1, F.P, size=(n, 1), dtype=np.uint32)
    t[::2, 0] = 0
    return t


@pytest.fixture(scope="module")
def config():
    return poseidon2_stark_config(
        F, KoalaBearExt4, FriParameters.new_testing()
    )


def test_preprocessed_roundtrip(config):
    rng = np.random.default_rng(2)
    air = EvenZeroAir(F)
    log_n = 5
    pre = setup_preprocessed(config, air, log_n)
    trace = jnp.asarray(F.to_monty_np(_trace(log_n, rng)))
    proof = prove_with_preprocessed(config, air, trace, [], pre)
    verify_with_preprocessed(config, air, proof, [], pre.root, pre.width)


def test_preprocessed_bad_trace_rejected(config):
    rng = np.random.default_rng(3)
    air = EvenZeroAir(F)
    log_n = 4
    pre = setup_preprocessed(config, air, log_n)
    bad = _trace(log_n, rng)
    bad[2, 0] = 7  # violates the selector constraint
    trace = jnp.asarray(F.to_monty_np(bad))
    proof = prove_with_preprocessed(config, air, trace, [], pre)
    with pytest.raises(VerificationError):
        verify_with_preprocessed(
            config, air, proof, [], pre.root, pre.width
        )
