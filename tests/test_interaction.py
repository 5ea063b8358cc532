"""Lookup buses across batch-stark instances (lookup/src/{bus,builder}
+ batch-stark lookup wiring): two instances exchanging bus messages
under one batch proof, multi-bus, and unbalanced-bus rejection."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_tpu.air.api import BaseAir
from plonky3_tpu.fields import KoalaBearExt4
from plonky3_tpu.fields.params import KoalaBear as F
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.stark.batch import BatchInstance
from plonky3_tpu.stark.config import poseidon2_stark_config
from plonky3_tpu.stark.interaction import (
    LookupBus,
    PermutationCheckBus,
    prove_batch_with_lookups,
    verify_batch_with_lookups,
)
from plonky3_tpu.stark.verifier import VerificationError

RANGE = LookupBus("range8")
PIPE = PermutationCheckBus("pipe")


class QueryAir(BaseAir):
    """Every row looks one value up on the range bus."""

    width = 1
    num_public_values = 0

    def __init__(self, field):
        self.field = field

    def eval(self, b):
        RANGE.lookup_key(b, [b.main.local[0]], 1)


class TableAir(BaseAir):
    """Provides the 0..n-1 range table with per-entry multiplicities."""

    width = 2  # value, multiplicity
    num_public_values = 0

    def __init__(self, field):
        self.field = field

    def eval(self, b):
        local, nxt = b.main.local, b.main.next
        b.when_first_row().assert_zero(local[0])
        b.when_transition().assert_eq(nxt[0], local[0] + 1)
        RANGE.table_entry(b, [local[0]], local[1])


class SendAir(BaseAir):
    """Sends (a, b) pairs on the pipe bus."""

    width = 2
    num_public_values = 0

    def __init__(self, field):
        self.field = field

    def eval(self, b):
        PIPE.send(b, [b.main.local[0], b.main.local[1]], 1)


class RecvAir(BaseAir):
    """Receives (a, b) pairs on the pipe bus."""

    width = 2
    num_public_values = 0

    def __init__(self, field):
        self.field = field

    def eval(self, b):
        PIPE.receive(b, [b.main.local[0], b.main.local[1]], 1)


@pytest.fixture(scope="module")
def config():
    return poseidon2_stark_config(
        F, KoalaBearExt4, FriParameters.new_testing()
    )


def _dev(trace_std):
    return jnp.asarray(F.to_monty_np(trace_std.astype(np.uint32)))


def _lookup_instances(rng, log_n):
    n = 1 << log_n
    q = rng.integers(0, n, size=n)
    counts = np.bincount(q, minlength=n)
    q_trace = q.reshape(n, 1).astype(np.uint32)
    t_trace = np.stack([np.arange(n), counts], axis=1).astype(np.uint32)
    return [
        BatchInstance(air=QueryAir(F), trace=_dev(q_trace),
                      public_values=[]),
        BatchInstance(air=TableAir(F), trace=_dev(t_trace),
                      public_values=[]),
    ]


def test_bus_lookup_roundtrip(config):
    rng = np.random.default_rng(11)
    instances = _lookup_instances(rng, 4)
    proof = prove_batch_with_lookups(config, instances)
    verify_batch_with_lookups(
        config, [i.air for i in instances], proof, [[], []]
    )


def test_permutation_bus_roundtrip(config):
    rng = np.random.default_rng(12)
    n = 16
    pairs = rng.integers(0, F.P, size=(n, 2)).astype(np.uint32)
    perm = rng.permutation(n)
    instances = [
        BatchInstance(air=SendAir(F), trace=_dev(pairs),
                      public_values=[]),
        BatchInstance(air=RecvAir(F), trace=_dev(pairs[perm]),
                      public_values=[]),
    ]
    proof = prove_batch_with_lookups(config, instances)
    verify_batch_with_lookups(
        config, [i.air for i in instances], proof, [[], []]
    )


def test_unbalanced_bus_rejected(config):
    rng = np.random.default_rng(13)
    n = 16
    pairs = rng.integers(0, F.P, size=(n, 2)).astype(np.uint32)
    other = pairs.copy()
    other[0, 0] = (other[0, 0] + 1) % F.P  # one message never received
    instances = [
        BatchInstance(air=SendAir(F), trace=_dev(pairs),
                      public_values=[]),
        BatchInstance(air=RecvAir(F), trace=_dev(other),
                      public_values=[]),
    ]
    proof = prove_batch_with_lookups(config, instances)
    with pytest.raises(VerificationError):
        verify_batch_with_lookups(
            config, [i.air for i in instances], proof, [[], []]
        )


def test_tampered_terminal_rejected(config):
    rng = np.random.default_rng(14)
    instances = _lookup_instances(rng, 4)
    proof = prove_batch_with_lookups(config, instances)
    t = proof.terminals[0]
    delta = tuple((x + 1) % F.P for x in t)
    # shift both terminals so the sum stays zero but the committed
    # values no longer match the openings
    proof.terminals[0] = delta
    proof.terminals[1] = tuple(
        (y - 1) % F.P for y in proof.terminals[1]
    )
    with pytest.raises(VerificationError):
        verify_batch_with_lookups(
            config, [i.air for i in instances], proof, [[], []]
        )
