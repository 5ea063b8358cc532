"""Poseidon2-Goldilocks + D=2 extension (model:
goldilocks/src/{poseidon2.rs,extension.rs} tests)."""

from plonky3_tpu.fields.goldilocks import (
    Goldilocks,
    GoldilocksExt2Field as E2,
)
from plonky3_tpu.hashes.poseidon2_goldilocks import (
    poseidon2_goldilocks_permute,
)


def test_poseidon2_goldilocks_width8_kat():
    """goldilocks/src/poseidon2.rs:1236-1253."""
    out = poseidon2_goldilocks_permute(list(range(8)))
    assert out == [
        0x020CF04A1B214D14, 0x84E14AAAEACAED25,
        0x1AE0F640E81C7457, 0xA4D204CBAEB0D8A5,
        0x0CF637B627B3A7FF, 0x788D304D948B486B,
        0x7327133EA1949AF4, 0xF415ABB924DA395B,
    ]


def test_ext2_field_axioms():
    a, b, c = (3, 5), (7, 11), (13, 17)
    assert E2.mul_h(a, E2.mul_h(b, c)) == E2.mul_h(E2.mul_h(a, b), c)
    assert E2.mul_h(E2.mul_h(a, b), E2.inv_h(b)) == a
    assert E2.add_h(a, E2.neg_h(a)) == E2.zero_h()


def test_ext2_two_adicity():
    g = E2.two_adic_generator_h(33)
    assert E2.exp_h(g, 1 << 33) == E2.one_h()
    assert E2.exp_h(g, 1 << 32) == E2.neg_h(E2.one_h())
    # squaring-consistency down the chain
    for bits in (33, 32, 10, 1):
        gk = E2.two_adic_generator_h(bits)
        assert E2.exp_h(gk, 1 << bits) == E2.one_h()
        if bits > 1:
            assert E2.mul_h(
                E2.two_adic_generator_h(bits),
                E2.two_adic_generator_h(bits),
            ) == E2.two_adic_generator_h(bits - 1) or E2.exp_h(
                E2.two_adic_generator_h(bits), 2
            ) == E2.two_adic_generator_h(bits - 1)


def test_ext2_frobenius():
    a = (123456789, 987654321)
    assert E2.frobenius_h(a) == E2.exp_h(a, Goldilocks.P)
