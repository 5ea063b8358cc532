"""Quintic trinomial + M31 cubic extensions (model:
koala-bear/src/extension_test.rs, mersenne-31/src/extension.rs tests)."""

from plonky3_tpu.fields.mersenne31 import Mersenne31 as M31
from plonky3_tpu.fields.more_extensions import (
    KB_QUINTIC_EXT_GENERATOR,
    KoalaBearQuintic as Q,
    M31_CUBIC_EXT_GENERATOR,
    Mersenne31Cubic as C3,
)
from plonky3_tpu.fields.params import KoalaBear as KB


def test_quintic_axioms_and_inverse():
    a, b, c = (3, 1, 4, 1, 5), (2, 7, 1, 8, 2), (9, 8, 6, 2, 4)
    assert Q.mul_h(a, Q.mul_h(b, c)) == Q.mul_h(Q.mul_h(a, b), c)
    assert Q.mul_h(Q.mul_h(a, b), Q.inv_h(b)) == a
    assert Q.add_h(a, Q.neg_h(a)) == Q.zero_h()


def test_quintic_frobenius_table_matches_x_pow_p():
    """The extracted TrinomialQuinticData FROBENIUS_COEFFS must realize
    a -> a^p exactly (koala_bear.rs:128)."""
    for a in [(3, 1, 4, 1, 5), (0, 1, 0, 0, 0), (7, 0, 0, 0, 11)]:
        assert Q.frobenius_h(a) == Q.exp_h(a, KB.P)


def test_quintic_generator():
    g = KB_QUINTIC_EXT_GENERATOR
    assert Q.exp_h(g, (KB.P ** 5 - 1) // 2) == Q.neg_h(Q.one_h())


def test_m31_cubic():
    x, y = (3, 1, 4), (1, 5, 9)
    assert C3.mul_h(C3.mul_h(x, y), C3.inv_h(y)) == x
    assert C3.exp_h(
        M31_CUBIC_EXT_GENERATOR, (M31.P ** 3 - 1) // 2
    ) == C3.neg_h(C3.one_h())
