"""Bit-identity against the reference's golden postcard fixtures.

The north star (SURVEY §8.5, BASELINE.md): our verifier must ACCEPT the
reference's serialized proofs, and our prover must REPRODUCE them
byte-for-byte (`uni-stark/tests/fixtures/uni_stark_two_adic_v1.postcard`,
written at fib_air.rs:131-132 by `two_adic_compat_case`).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from plonky3_tpu.compat.fixture_configs import (
    FIXTURE_TWO_ADIC,
    two_adic_fixture_config,
)
from plonky3_tpu.compat.uni_stark_wire import (
    decode_to_our_proof,
    encode_our_proof,
)
from plonky3_tpu.fields import BabyBear as F
from plonky3_tpu.models.fibonacci import FibonacciAir, generate_fibonacci_trace
from plonky3_tpu.serde.proof_codec import TWO_ADIC_SPEC, decode_proof, encode_proof
from plonky3_tpu.stark.prover import prove
from plonky3_tpu.stark.verifier import VerificationError, verify

requires_fixture = pytest.mark.skipif(
    not os.path.exists(FIXTURE_TWO_ADIC), reason="reference fixture absent"
)


@requires_fixture
def test_codec_roundtrip_two_adic():
    data = open(FIXTURE_TWO_ADIC, "rb").read()
    assert encode_proof(decode_proof(data, TWO_ADIC_SPEC), TWO_ADIC_SPEC) == data


@requires_fixture
def test_reference_proof_verifies():
    """Our verifier accepts the reference's golden proof."""
    data = open(FIXTURE_TWO_ADIC, "rb").read()
    proof = decode_to_our_proof(data, F, TWO_ADIC_SPEC)
    cfg = two_adic_fixture_config(2)
    verify(cfg, FibonacciAir(F), proof, [0, 1, 21])


@requires_fixture
def test_reference_proof_tamper_rejected():
    data = open(FIXTURE_TWO_ADIC, "rb").read()
    proof = decode_to_our_proof(data, F, TWO_ADIC_SPEC)
    cfg = two_adic_fixture_config(2)
    tl = list(proof.opened_values.trace_local)
    tl[0] = tuple((c + 1) % F.P for c in tl[0])
    proof.opened_values.trace_local = tl
    with pytest.raises(VerificationError):
        verify(cfg, FibonacciAir(F), proof, [0, 1, 21])


@requires_fixture
def test_prover_reproduces_fixture_bytes():
    """Byte-for-byte reproduction of the reference proof."""
    cfg = two_adic_fixture_config(2)
    air = FibonacciAir(F)
    trace_std, publics = generate_fibonacci_trace(F, 3)
    assert publics == [0, 1, 21]
    proof = prove(cfg, air, jnp.asarray(F.to_monty_np(trace_std)), publics)
    got = encode_our_proof(proof, F, TWO_ADIC_SPEC)
    want = open(FIXTURE_TWO_ADIC, "rb").read()
    assert got == want


# ---------------------------------------------------------------------------
# Circle fixture (uni_stark_circle_v1.postcard: M31 + cubic ext + keccak256)
# ---------------------------------------------------------------------------
from plonky3_tpu.compat.fixture_configs import FIXTURE_CIRCLE, circle_fixture_config
from plonky3_tpu.compat.uni_stark_wire import (
    circle_proof_to_wire,
    circle_wire_to_proof,
)
from plonky3_tpu.fields.mersenne31 import Mersenne31
from plonky3_tpu.serde.proof_codec import CIRCLE_SPEC

requires_circle_fixture = pytest.mark.skipif(
    not os.path.exists(FIXTURE_CIRCLE), reason="reference fixture absent"
)


@requires_circle_fixture
def test_codec_roundtrip_circle():
    data = open(FIXTURE_CIRCLE, "rb").read()
    assert encode_proof(decode_proof(data, CIRCLE_SPEC), CIRCLE_SPEC) == data


@requires_circle_fixture
def test_circle_reference_proof_verifies():
    data = open(FIXTURE_CIRCLE, "rb").read()
    proof = circle_wire_to_proof(decode_proof(data, CIRCLE_SPEC))
    cfg = circle_fixture_config()
    verify(cfg, FibonacciAir(Mersenne31), proof, [0, 1, 21])


@requires_circle_fixture
def test_circle_reference_proof_tamper_rejected():
    data = open(FIXTURE_CIRCLE, "rb").read()
    proof = circle_wire_to_proof(decode_proof(data, CIRCLE_SPEC))
    cfg = circle_fixture_config()
    lam = list(proof.opening_proof.lambdas)
    lam[0] = tuple((c + 1) % Mersenne31.P for c in lam[0])
    proof.opening_proof.lambdas = lam
    with pytest.raises(VerificationError):
        verify(cfg, FibonacciAir(Mersenne31), proof, [0, 1, 21])


@requires_circle_fixture
def test_circle_prover_reproduces_fixture_bytes():
    cfg = circle_fixture_config()
    air = FibonacciAir(Mersenne31)
    trace_std, publics = generate_fibonacci_trace(Mersenne31, 3)
    proof = prove(cfg, air, jnp.asarray(trace_std.astype(np.uint32)), publics)
    got = encode_proof(circle_proof_to_wire(proof), CIRCLE_SPEC)
    want = open(FIXTURE_CIRCLE, "rb").read()
    assert got == want
