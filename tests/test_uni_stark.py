"""End-to-end uni-stark prove+verify (model: uni-stark/tests/fib_air.rs,
mul_air.rs: round-trips + tamper rejection + debug checker)."""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky3_tpu.air.api import check_constraints, get_log_num_quotient_chunks
from plonky3_tpu.air.api import BaseAir
from plonky3_tpu.fields import KoalaBear, KoalaBearExt4
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.models.fibonacci import FibonacciAir, generate_fibonacci_trace
from plonky3_tpu.stark.config import poseidon2_stark_config
from plonky3_tpu.stark.prover import prove
from plonky3_tpu.stark.verifier import VerificationError, verify

F = KoalaBear
E = KoalaBearExt4


@pytest.fixture(scope="module")
def config():
    return poseidon2_stark_config(F, E, FriParameters.new_testing())


def test_debug_checker_fib():
    air = FibonacciAir(F)
    trace, publics = generate_fibonacci_trace(F, 4)
    assert check_constraints(air, trace, publics) == []
    bad = trace.copy()
    bad[5, 1] = (int(bad[5, 1]) + 1) % F.P
    fails = check_constraints(air, bad, publics)
    assert fails, "tampered trace must fail the debug checker"


def test_quotient_chunks_count():
    assert get_log_num_quotient_chunks(FibonacciAir(F)) == 0


@pytest.mark.parametrize("log_n", [3, 6])
def test_fib_prove_verify(config, log_n):
    air = FibonacciAir(F)
    trace_std, publics = generate_fibonacci_trace(F, log_n)
    trace = jnp.asarray(F.to_monty_np(trace_std))
    proof = prove(config, air, trace, publics)
    verify(config, air, proof, publics)


def test_fib_rejects_wrong_public_values(config):
    air = FibonacciAir(F)
    trace_std, publics = generate_fibonacci_trace(F, 4)
    trace = jnp.asarray(F.to_monty_np(trace_std))
    proof = prove(config, air, trace, publics)
    bad = list(publics)
    bad[2] = (bad[2] + 1) % F.P
    with pytest.raises(VerificationError):
        verify(config, air, proof, bad)


def test_fib_rejects_tampered_opened_values(config):
    air = FibonacciAir(F)
    trace_std, publics = generate_fibonacci_trace(F, 4)
    trace = jnp.asarray(F.to_monty_np(trace_std))
    proof = prove(config, air, trace, publics)
    tl = list(proof.opened_values.trace_local)
    tl[0] = E.add_h(tl[0], E.one_h())
    proof.opened_values.trace_local = tl
    with pytest.raises(VerificationError):
        verify(config, air, proof, publics)


def test_fib_rejects_tampered_commitment(config):
    air = FibonacciAir(F)
    trace_std, publics = generate_fibonacci_trace(F, 4)
    trace = jnp.asarray(F.to_monty_np(trace_std))
    proof = prove(config, air, trace, publics)
    bad = list(proof.commitments.trace)
    bad[0] = (bad[0] + 1) % F.P
    proof.commitments.trace = tuple(bad)
    with pytest.raises(VerificationError):
        verify(config, air, proof, publics)


class MulAir(BaseAir):
    """Degree-3 AIR (model: uni-stark/tests/mul_air.rs): c = a·b, plus a
    cubic mixing constraint to force 2 quotient chunks."""

    width = 3
    num_public_values = 0

    def __init__(self, field):
        self.field = field

    def eval(self, b):
        a, x, c = b.main.local
        b.assert_eq(a * x, c)
        b.when_transition().assert_eq(
            b.main.next[0], a * x * c + a
        )


def generate_mul_trace(F, log_n, rng):
    n = 1 << log_n
    rows = np.zeros((n, 3), dtype=np.uint64)
    a = int(rng.integers(1, F.P))
    for i in range(n):
        x = (a * 3 + i) % F.P
        c = (a * x) % F.P
        rows[i] = (a, x, c)
        a = (a * x % F.P * c + a) % F.P
    return rows.astype(np.uint32)


def test_mul_air_degree3_two_chunks(config, rng):
    air = MulAir(F)
    assert get_log_num_quotient_chunks(air) == 1
    trace_std = generate_mul_trace(F, 4, rng)
    assert check_constraints(air, trace_std, []) == []
    trace = jnp.asarray(F.to_monty_np(trace_std))
    proof = prove(config, air, trace, [])
    assert len(proof.opened_values.quotient_chunks) == 2
    verify(config, air, proof, [])


def test_zeta_in_domain_rejected(config, monkeypatch):
    """ζ landing on the trace domain must be rejected explicitly
    (uni-stark/src/verifier.rs:448 OodPointInDomain)."""
    air = FibonacciAir(F)
    trace_std, publics = generate_fibonacci_trace(F, 4)
    trace = jnp.asarray(F.to_monty_np(trace_std))
    proof = prove(config, air, trace, publics)

    # Force the second sample_ext (ζ) to return a domain point embedded in E.
    dom = config.pcs.natural_domain_for_degree(1 << proof.degree_bits)
    g = dom.first_point()  # a point of the trace domain (base field)
    from plonky3_tpu.challenger import duplex as _dx

    orig = _dx.DuplexChallenger.sample_ext
    calls = {"n": 0}

    def patched(self, d):
        calls["n"] += 1
        out = orig(self, d)
        if calls["n"] == 2:  # α is 1st, ζ is 2nd
            return E.from_base_h(g)
        return out

    monkeypatch.setattr(_dx.DuplexChallenger, "sample_ext", patched)
    with pytest.raises(VerificationError, match="OodPointInDomain"):
        verify(config, air, proof, publics)
