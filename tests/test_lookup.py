"""LogUp lookup argument over uni-stark (lookup/src/logup.rs model)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_tpu.air.api import BaseAir
from plonky3_tpu.fields import KoalaBearExt4
from plonky3_tpu.fields.params import KoalaBear as F
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.stark.config import poseidon2_stark_config
from plonky3_tpu.stark.lookup import (
    LookupColumns,
    build_permutation_trace,
    prove_with_lookup,
    verify_with_lookup,
)
from plonky3_tpu.stark.verifier import VerificationError


class RangeCheckAir(BaseAir):
    """Inner AIR: table column equals the row index chain (b_next = b+1
    on transitions, b_first = 0) — a 0..n-1 range table; the lookup then
    proves every `a` lies in that range."""

    width = 4  # a, m_a, b, m_b
    num_public_values = 0

    def __init__(self, field):
        self.field = field

    def eval(self, bld):
        local, nxt = bld.main.local, bld.main.next
        bld.when_first_row().assert_zero(local[2])
        bld.when_transition().assert_eq(nxt[2], local[2] + 1)


def _make_trace(rng, log_n):
    n = 1 << log_n
    a = rng.integers(0, n, size=n)
    m_b = np.bincount(a, minlength=n)
    trace = np.zeros((n, 4), dtype=np.uint32)
    trace[:, 0] = a
    trace[:, 1] = 1  # m_a
    trace[:, 2] = np.arange(n)  # table
    trace[:, 3] = m_b
    return trace


@pytest.fixture(scope="module")
def config():
    return poseidon2_stark_config(
        F, KoalaBearExt4, FriParameters.new_testing()
    )


def test_lookup_roundtrip(config):
    rng = np.random.default_rng(5)
    air = RangeCheckAir(F)
    cols = LookupColumns(a=0, m_a=1, b=2, m_b=3)
    trace = _make_trace(rng, 4)
    proof, perm_root = prove_with_lookup(
        config, air, jnp.asarray(F.to_monty_np(trace)), [], cols
    )
    verify_with_lookup(config, air, proof, perm_root, [], cols)


def test_unbalanced_lookup_fails(config):
    rng = np.random.default_rng(6)
    air = RangeCheckAir(F)
    cols = LookupColumns(a=0, m_a=1, b=2, m_b=3)
    trace = _make_trace(rng, 4)
    trace[3, 0] = (trace[3, 0] + 1) % 16  # a no longer matches m_b
    with pytest.raises(ValueError):
        # terminal != 0 — the prover itself refuses
        prove_with_lookup(
            config, air, jnp.asarray(F.to_monty_np(trace)), [], cols
        )


def test_tampered_perm_root_rejected(config):
    rng = np.random.default_rng(7)
    air = RangeCheckAir(F)
    cols = LookupColumns(a=0, m_a=1, b=2, m_b=3)
    trace = _make_trace(rng, 4)
    proof, perm_root = prove_with_lookup(
        config, air, jnp.asarray(F.to_monty_np(trace)), [], cols
    )
    bad_root = tuple((x + 1) % F.P for x in perm_root)
    with pytest.raises(VerificationError):
        verify_with_lookup(config, air, proof, bad_root, [], cols)
