"""Keccak-f AIR: trace correctness, debug checker, e2e prove+verify
(model: keccak-air/src/air.rs tests + examples airs.rs keccak-f objective)."""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky3_tpu.air.api import check_constraints, get_log_num_quotient_chunks
from plonky3_tpu.fields import KoalaBear, KoalaBearExt4
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.models.keccak_air import (
    NUM_KECCAK_COLS,
    KeccakAir,
    generate_keccak_trace,
    keccak_f_reference,
    OFF_A_PPP_00, OFF_A_PP, _app, _a,
)
from plonky3_tpu.stark.config import poseidon2_stark_config
from plonky3_tpu.stark.prover import prove
from plonky3_tpu.stark.verifier import VerificationError, verify

F, E = KoalaBear, KoalaBearExt4


def test_keccak_f_reference_kat():
    # keccak-f[1600] of the zero state (well-known vector, first lane)
    out = keccak_f_reference(np.zeros(25, np.uint64))
    assert out[0] == 0xF1258F7940E1DDE7


def test_trace_final_row_state():
    rng = np.random.default_rng(3)
    inputs = rng.integers(0, 1 << 64, size=(2, 25), dtype=np.uint64)
    trace = generate_keccak_trace(F, inputs)
    assert trace.shape == (64, NUM_KECCAK_COLS)
    # final round's a''' / a'' columns must recompose to keccak_f(input)
    for b in range(2):
        want = keccak_f_reference(inputs[b])
        final = trace[b * 24 + 23]
        for x in range(5):
            for y in range(5):
                if (x, y) == (0, 0):
                    limbs = final[OFF_A_PPP_00 : OFF_A_PPP_00 + 4]
                else:
                    limbs = final[_app(y, x, 0) : _app(y, x, 0) + 4]
                got = sum(int(l) << (16 * i) for i, l in enumerate(limbs))
                assert got == int(want[x + 5 * y]), (b, x, y)


def test_debug_checker_and_tamper():
    rng = np.random.default_rng(4)
    inputs = rng.integers(0, 1 << 64, size=(1, 25), dtype=np.uint64)
    trace = generate_keccak_trace(F, inputs)
    air = KeccakAir(F)
    assert check_constraints(air, trace, []) == []
    bad = trace.copy()
    bad[5, _a(2, 3, 1)] ^= 1
    assert check_constraints(air, bad, [])


def test_quotient_chunks():
    assert get_log_num_quotient_chunks(KeccakAir(F)) == 1


@pytest.mark.slow
def test_keccak_air_prove_verify():
    rng = np.random.default_rng(5)
    inputs = rng.integers(0, 1 << 64, size=(2, 25), dtype=np.uint64)
    trace = generate_keccak_trace(F, inputs)
    air = KeccakAir(F)
    config = poseidon2_stark_config(F, E, FriParameters.new_testing())
    proof = prove(config, air, jnp.asarray(F.to_monty_np(trace)), [])
    verify(config, air, proof, [])
    # tamper
    bad = list(proof.opened_values.trace_local)
    bad[0] = tuple((c + 1) % F.P for c in bad[0])
    proof.opened_values.trace_local = bad
    with pytest.raises(VerificationError):
        verify(config, air, proof, [])
