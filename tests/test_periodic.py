"""Periodic columns (air/src/air.rs:28-99; uni-stark/tests/
periodic_air.rs model): derived public values usable in constraints
without being committed."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_tpu.air.api import BaseAir, check_constraints
from plonky3_tpu.fields import KoalaBear as F, KoalaBearExt4 as E
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.stark.config import poseidon2_stark_config
from plonky3_tpu.stark.prover import prove
from plonky3_tpu.stark.verifier import VerificationError, verify

PATTERN = [1, 7, 3, 9]  # period 4
MASK = [5, 11]  # period 2


class PeriodicAir(BaseAir):
    """col0 must equal the period-4 pattern; col1 = col0 · mask."""

    width = 2
    num_public_values = 0

    def __init__(self, field):
        self.field = field

    def periodic_columns(self):
        return [PATTERN, MASK]

    def eval(self, b):
        local = b.main.local
        b.assert_zero(local[0] - b.periodic[0])
        b.assert_zero(local[1] - local[0] * b.periodic[1])


def _trace(n):
    col0 = np.array([PATTERN[i % 4] for i in range(n)], np.uint32)
    col1 = np.array(
        [(PATTERN[i % 4] * MASK[i % 2]) % F.P for i in range(n)],
        np.uint32,
    )
    return np.stack([col0, col1], axis=1)


def test_periodic_check_constraints():
    air = PeriodicAir(F)
    assert check_constraints(air, _trace(16), []) == []
    bad = _trace(16)
    bad[5, 0] = 99
    assert check_constraints(air, bad, []) != []


def test_periodic_e2e():
    config = poseidon2_stark_config(F, E, FriParameters.new_testing())
    air = PeriodicAir(F)
    trace = jnp.asarray(F.to_monty_np(_trace(32)))
    proof = prove(config, air, trace, [])
    verify(config, air, proof, [])


def test_periodic_e2e_rejects_wrong_pattern():
    config = poseidon2_stark_config(F, E, FriParameters.new_testing())
    air = PeriodicAir(F)
    bad = _trace(32)
    bad[3, 0] = (bad[3, 0] + 1) % F.P
    trace = jnp.asarray(F.to_monty_np(bad))
    proof = prove(config, air, trace, [])
    with pytest.raises(VerificationError):
        verify(config, air, proof, [])


class NoNextRowAir(PeriodicAir):
    """Same constraints (current-row only) + the declaration that lets
    the prover open the trace at zeta alone (air.rs
    main_next_row_columns)."""

    def main_next_row_columns(self):
        return []


def test_no_next_row_opening():
    config = poseidon2_stark_config(F, E, FriParameters.new_testing())
    air = NoNextRowAir(F)
    trace = jnp.asarray(F.to_monty_np(_trace(32)))
    proof = prove(config, air, trace, [])
    assert proof.opened_values.trace_next is None
    verify(config, air, proof, [])
    # a full-opening proof must NOT verify under the declared-air shape
    full_air = PeriodicAir(F)
    proof_full = prove(config, full_air, trace, [])
    with pytest.raises(VerificationError):
        verify(config, air, proof_full, [])
