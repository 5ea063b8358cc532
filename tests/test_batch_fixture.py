"""Bit-identity against the reference batch-stark golden fixtures
(batch-stark/tests/fixtures/batch_stark_two_adic_v1.postcard, written by
simple.rs two_adic_compat_case: MulAirLookups + FibAirLookups with a
shared "MulFib" LogUp bus and a preprocessed Fibonacci index column)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from plonky3_tpu.compat.batch_fixture_airs import (
    FibAirLookups,
    MulAirLookups,
    mul_trace,
)
from plonky3_tpu.compat.batch_wire import (
    decode_to_batch_ref_proof,
    encode_batch_ref_proof,
)
from plonky3_tpu.compat.fixture_configs import (
    FIXTURE_BATCH_TWO_ADIC,
    batch_two_adic_fixture_config,
)
from plonky3_tpu.fields import BabyBear as F
from plonky3_tpu.models.fibonacci import generate_fibonacci_trace
from plonky3_tpu.serde.proof_codec import (
    TWO_ADIC_SPEC,
    decode_batch_proof,
    encode_batch_proof,
)
from plonky3_tpu.stark.batch import BatchInstance
from plonky3_tpu.stark.batch_ref import (
    keygen,
    prove_batch_ref,
    verify_batch_ref,
)
from plonky3_tpu.stark.verifier import VerificationError

requires_fixture = pytest.mark.skipif(
    not os.path.exists(FIXTURE_BATCH_TWO_ADIC),
    reason="reference fixture absent",
)


def _case():
    cfg = batch_two_adic_fixture_config()
    log_n = 5
    mul_air = MulAirLookups(F, reps=2, is_local=False, is_global=True)
    fib_air = FibAirLookups(F, log_height=log_n, is_global=True)
    mtrace = mul_trace(F, 1 << log_n, 2)
    ftrace, fib_pis = generate_fibonacci_trace(F, log_n)
    airs = [mul_air, fib_air]
    pvs = [[], fib_pis]
    return cfg, airs, mtrace, ftrace, pvs


@requires_fixture
def test_batch_codec_roundtrip():
    data = open(FIXTURE_BATCH_TWO_ADIC, "rb").read()
    assert (
        encode_batch_proof(decode_batch_proof(data, TWO_ADIC_SPEC),
                           TWO_ADIC_SPEC) == data
    )


@requires_fixture
def test_batch_reference_proof_verifies():
    cfg, airs, _, _, pvs = _case()
    data = open(FIXTURE_BATCH_TWO_ADIC, "rb").read()
    proof = decode_to_batch_ref_proof(data, F, TWO_ADIC_SPEC)
    common = keygen(cfg, airs, proof.degree_bits)
    verify_batch_ref(cfg, airs, proof, pvs, common)


@requires_fixture
def test_batch_reference_proof_tamper_rejected():
    cfg, airs, _, _, pvs = _case()
    data = open(FIXTURE_BATCH_TWO_ADIC, "rb").read()
    proof = decode_to_batch_ref_proof(data, F, TWO_ADIC_SPEC)
    common = keygen(cfg, airs, proof.degree_bits)
    tl = list(proof.instances[0].trace_local)
    tl[0] = tuple((c + 1) % F.P for c in tl[0])
    proof.instances[0].trace_local = tl
    with pytest.raises(VerificationError):
        verify_batch_ref(cfg, airs, proof, pvs, common)


# ---------------------------------------------------------------------------
# circle batch fixture (M31 + cubic ext + keccak digests + cap height 3)
# ---------------------------------------------------------------------------
from plonky3_tpu.compat.batch_wire import (
    batch_circle_proof_to_wire,
    wire_to_batch_circle_proof,
)
from plonky3_tpu.compat.fixture_configs import (
    FIXTURE_BATCH_CIRCLE,
    batch_circle_fixture_config,
)
from plonky3_tpu.fields.mersenne31 import Mersenne31
from plonky3_tpu.serde.proof_codec import CIRCLE_SPEC, WireSpec

BATCH_CIRCLE_SPEC = WireSpec(
    ext_d=3, digest_kind="bytes", digest_n=32, circle=True
)

requires_circle_fixture = pytest.mark.skipif(
    not os.path.exists(FIXTURE_BATCH_CIRCLE),
    reason="reference fixture absent",
)


def _circle_case():
    cfg = batch_circle_fixture_config()
    log_n = 3
    M = Mersenne31
    mul_air = MulAirLookups(M, reps=2, is_local=False, is_global=True)
    fib_air = FibAirLookups(M, log_height=log_n, is_global=True)
    mtrace = mul_trace(M, 1 << log_n, 2)
    ftrace, fib_pis = generate_fibonacci_trace(M, log_n)
    return cfg, [mul_air, fib_air], mtrace, ftrace, [[], fib_pis]


@requires_circle_fixture
def test_batch_circle_codec_roundtrip():
    data = open(FIXTURE_BATCH_CIRCLE, "rb").read()
    assert (
        encode_batch_proof(
            decode_batch_proof(data, BATCH_CIRCLE_SPEC),
            BATCH_CIRCLE_SPEC,
        ) == data
    )


@requires_circle_fixture
def test_batch_circle_reference_proof_verifies():
    cfg, airs, _, _, pvs = _circle_case()
    data = open(FIXTURE_BATCH_CIRCLE, "rb").read()
    proof = wire_to_batch_circle_proof(
        decode_batch_proof(data, BATCH_CIRCLE_SPEC)
    )
    common = keygen(cfg, airs, proof.degree_bits)
    verify_batch_ref(cfg, airs, proof, pvs, common)


@requires_circle_fixture
def test_batch_circle_prover_reproduces_fixture_bytes():
    cfg, airs, mtrace, ftrace, pvs = _circle_case()
    common = keygen(cfg, airs, [3, 3])
    M = Mersenne31
    instances = [
        BatchInstance(
            air=airs[0],
            trace=jnp.asarray(mtrace.astype(np.uint32)),
            public_values=pvs[0],
        ),
        BatchInstance(
            air=airs[1],
            trace=jnp.asarray(ftrace.astype(np.uint32)),
            public_values=pvs[1],
        ),
    ]
    proof = prove_batch_ref(cfg, instances, common)
    got = encode_batch_proof(
        batch_circle_proof_to_wire(proof), BATCH_CIRCLE_SPEC
    )
    want = open(FIXTURE_BATCH_CIRCLE, "rb").read()
    assert got == want


@requires_fixture
def test_batch_prover_reproduces_fixture_bytes():
    cfg, airs, mtrace, ftrace, pvs = _case()
    common = keygen(cfg, airs, [5, 5])
    instances = [
        BatchInstance(
            air=airs[0],
            trace=jnp.asarray(F.to_monty_np(mtrace)),
            public_values=pvs[0],
        ),
        BatchInstance(
            air=airs[1],
            trace=jnp.asarray(F.to_monty_np(ftrace)),
            public_values=pvs[1],
        ),
    ]
    proof = prove_batch_ref(cfg, instances, common)
    got = encode_batch_ref_proof(proof, F, TWO_ADIC_SPEC)
    want = open(FIXTURE_BATCH_TWO_ADIC, "rb").read()
    assert got == want
