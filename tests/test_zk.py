"""ZK uni-stark (fib_air.rs test_zk analog): hiding commitments, masked
quotient, R-poly batch randomizer; round-trip + hiding property + tamper."""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky3_tpu.fields import KoalaBear as F, KoalaBearExt4 as E
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.models.fibonacci import FibonacciAir, generate_fibonacci_trace
from plonky3_tpu.stark.config import zk_stark_config
from plonky3_tpu.stark.prover import prove
from plonky3_tpu.stark.verifier import VerificationError, verify


def _prove(seed, log_n=3):
    cfg = zk_stark_config(F, E, FriParameters.new_testing(), seed=seed)
    air = FibonacciAir(F)
    tr, pis = generate_fibonacci_trace(F, log_n)
    proof = prove(cfg, air, jnp.asarray(F.to_monty_np(tr)), pis)
    return cfg, air, proof, pis


def test_zk_roundtrip():
    cfg, air, proof, pis = _prove(seed=1)
    assert proof.commitments.random is not None
    assert proof.degree_bits == 4  # log_ext = log_n + 1
    verify(cfg, air, proof, pis)


def test_zk_commitments_are_hiding():
    # same trace, different randomness -> different commitments
    _, _, p1, _ = _prove(seed=1)
    _, _, p2, _ = _prove(seed=2)
    assert p1.commitments.trace != p2.commitments.trace
    assert p1.commitments.quotient_chunks != p2.commitments.quotient_chunks


def test_zk_rejects_bad_publics():
    cfg, air, proof, pis = _prove(seed=3)
    bad = list(pis)
    bad[2] = (bad[2] + 1) % F.P
    with pytest.raises(VerificationError):
        verify(cfg, air, proof, bad)


def test_zk_rejects_tampered_random_opening():
    cfg, air, proof, pis = _prove(seed=4)
    r = list(proof.opened_values.random)
    r[0] = tuple((c + 1) % F.P for c in r[0])
    proof.opened_values.random = r
    with pytest.raises(VerificationError):
        verify(cfg, air, proof, pis)
