"""MultiField32Challenger + BN254 Poseidon2 (model:
challenger/src/multi_field_challenger.rs tests)."""

import pytest

from plonky3_tpu.challenger.multi_field import (
    MultiField32Challenger,
    MultiField32Sponge,
    MultiFieldCompressor,
    max_absorb_injective_limbs,
    squeeze_field_order_num_limbs,
)
from plonky3_tpu.fields.bn254 import BN254 as Bn254
from plonky3_tpu.fields.params import BabyBear, KoalaBear
from plonky3_tpu.hashes.poseidon2_bn254 import (
    P,
    poseidon2_bn254_permute,
)


def test_bn254_permutation_basics():
    out = poseidon2_bn254_permute([0, 0, 0])
    assert len(out) == 3
    assert any(x != 0 for x in out)
    # deterministic + injective-looking on distinct inputs
    assert poseidon2_bn254_permute([0, 0, 0]) == out
    assert poseidon2_bn254_permute([1, 0, 0]) != out
    assert all(0 <= x < P for x in out)


def test_packing_parameters():
    # 31-bit fields into a 254-bit field: 8 limbs absorb, 8-ish squeeze
    assert max_absorb_injective_limbs(KoalaBear) == 8
    assert max_absorb_injective_limbs(BabyBear) == 8
    assert squeeze_field_order_num_limbs(KoalaBear) >= 6


@pytest.mark.parametrize("F", [KoalaBear, BabyBear])
def test_challenger_deterministic_and_sensitive(F):
    a = MultiField32Challenger(F)
    b = MultiField32Challenger(F)
    for v in (1, 2, 3, 12345):
        a.observe(v)
        b.observe(v)
    assert a.sample() == b.sample()
    c = MultiField32Challenger(F)
    for v in (1, 2, 3, 12346):
        c.observe(v)
    assert c.sample() != a.sample() or c.sample() != a.sample()
    # samples are valid field elements
    for _ in range(20):
        s = a.sample()
        assert 0 <= s < F.P


def test_challenger_flush_boundary():
    """Observing exactly absorb_n * RATE values triggers a flush; the
    stream must stay deterministic across the boundary."""
    F = KoalaBear
    n = max_absorb_injective_limbs(F) * 2
    a = MultiField32Challenger(F)
    b = MultiField32Challenger(F)
    for v in range(n + 3):
        a.observe(v)
        b.observe(v)
    assert [a.sample() for _ in range(5)] == [
        b.sample() for _ in range(5)
    ]


def test_observe_digest_changes_stream():
    F = KoalaBear
    a = MultiField32Challenger(F)
    b = MultiField32Challenger(F)
    a.observe(7)
    b.observe(7)
    a.observe_digest([123456789])
    b.observe_digest([987654321])
    assert a.sample() != b.sample()


def test_grind_roundtrip():
    F = KoalaBear
    a = MultiField32Challenger(F)
    a.observe(42)
    w = a.grind(6)
    v = MultiField32Challenger(F)
    v.observe(42)
    assert v.check_witness(6, w)


def test_sponge_and_compressor():
    F = KoalaBear
    sponge = MultiField32Sponge(F)
    d1 = sponge.hash_iter_host([1, 2, 3, 4, 5])
    d2 = sponge.hash_iter_host([1, 2, 3, 4, 5])
    d3 = sponge.hash_iter_host([1, 2, 3, 4, 6])
    assert d1 == d2 != d3
    assert len(d1) == 1 and 0 <= d1[0] < Bn254.P
    # shifted packing distinguishes [x] from [0, x]
    assert sponge.hash_iter_host([5]) != sponge.hash_iter_host([0, 5])
    comp = MultiFieldCompressor()
    c = comp.compress_host(d1, d3)
    assert len(c) == 1 and c != comp.compress_host(d3, d1)
