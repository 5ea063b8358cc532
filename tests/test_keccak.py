"""Keccak layer: permutation KATs, sponge cross-consistency, e2e config.

Mirrors the reference's keccak test strategy (`keccak/src/lib.rs` tests:
KATs + SIMD-vs-scalar lockstep; examples/src/tests.rs keccak configs) —
here the lockstep is device-vs-numpy-vs-host-int.
"""

import numpy as np
import pytest

from plonky3_tpu.challenger.serializing import SerializingChallenger32
from plonky3_tpu.fields import KoalaBearExt4
from plonky3_tpu.fields.params import KoalaBear
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.hashes.keccak import (
    keccak256,
    keccak_f1600_host,
)
from plonky3_tpu.hashes.keccak_sponge import (
    KeccakCompressor,
    KeccakFieldSponge,
)
from plonky3_tpu.stark.config import keccak_stark_config

F = KoalaBear


def test_keccak_f_kat():
    # Keccak-f[1600] on the zero state (well-known first two lanes)
    out = keccak_f1600_host([0] * 25)
    assert out[0] == 0xF1258F7940E1DDE7
    assert out[1] == 0x84D5CCF933C0478A


def test_keccak256_kats():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


@pytest.mark.parametrize("width", [3, 8, 34, 40])
def test_sponge_device_np_host_lockstep(rng, width):
    sponge = KeccakFieldSponge(F)
    rows = F.rand_np(rng, (4, width))
    import jax.numpy as jnp

    dev = np.asarray(sponge.hash_rows_device([jnp.asarray(rows)]))
    hnp = sponge.hash_rows_np([rows])
    np.testing.assert_array_equal(dev, hnp)
    std = F.from_monty_np(rows)
    for i in range(4):
        host = sponge.hash_iter_host([int(x) for x in std[i]])
        assert tuple(int(x) for x in dev[i]) == host


def test_compressor_lockstep(rng):
    import jax.numpy as jnp

    comp = KeccakCompressor()
    l = rng.integers(0, 1 << 32, (5, 8), dtype=np.uint32)
    r = rng.integers(0, 1 << 32, (5, 8), dtype=np.uint32)
    dev = np.asarray(comp.compress_device(jnp.asarray(l), jnp.asarray(r)))
    hnp = comp.compress_np(l, r)
    np.testing.assert_array_equal(dev, hnp)
    got = comp.compress_host(tuple(int(x) for x in l[2]),
                             tuple(int(x) for x in r[2]))
    assert tuple(int(x) for x in dev[2]) == got


def test_serializing_challenger_determinism():
    a = SerializingChallenger32(F)
    b = SerializingChallenger32(F)
    for ch in (a, b):
        ch.observe(17)
        ch.observe_digest([1, 2, 3, 4, 5, 6, 7, 8])
    assert a.sample() == b.sample()
    assert a.sample_bits(10) == b.sample_bits(10)
    w = a.grind(8)
    assert b.check_witness(8, w)


def test_keccak_uni_stark_roundtrip():
    import jax.numpy as jnp

    from plonky3_tpu.models.fibonacci import (
        FibonacciAir,
        generate_fibonacci_trace,
    )
    from plonky3_tpu.stark.prover import prove
    from plonky3_tpu.stark.verifier import VerificationError, verify

    config = keccak_stark_config(
        F, KoalaBearExt4, FriParameters.new_testing()
    )
    air = FibonacciAir(F)
    rows, publics = generate_fibonacci_trace(F, 5)
    trace = jnp.asarray(F.to_monty_np(rows))
    proof = prove(config, air, trace, publics)
    verify(config, air, proof, publics)
    bad = [publics[0], publics[1], (publics[2] + 1) % F.P]
    with pytest.raises(VerificationError):
        verify(config, air, proof, bad)
