"""Batch inversion (Montgomery trick) + Tonelli–Shanks sqrt.

Mirrors `field/src/batch_inverse.rs` tests: batch result must equal
per-element Fermat inverse, zeros map to zero, and sqrt round-trips.
"""

import numpy as np
import pytest

from plonky3_tpu.fields import KoalaBear, BabyBear, KoalaBearExt4
from plonky3_tpu.fields.mersenne31 import Mersenne31

KOALABEAR, BABYBEAR, M31 = KoalaBear, BabyBear, Mersenne31


@pytest.mark.parametrize("F", [KOALABEAR, BABYBEAR, M31], ids=["kb", "bb", "m31"])
def test_batch_inv_matches_fermat(F):
    rng = np.random.default_rng(7)
    a = F.rand_np(rng, (257,)) if hasattr(F, "rand_np") else None
    got = np.asarray(F.batch_inv(a))
    want = np.asarray(F.inv(a))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("F", [KOALABEAR, M31], ids=["kb", "m31"])
def test_batch_inv_zeros(F):
    rng = np.random.default_rng(8)
    a = F.rand_np(rng, (64,))
    a[::5] = 0
    got = np.asarray(F.batch_inv(a))
    assert (got[::5] == 0).all()
    nz = a != 0
    np.testing.assert_array_equal(got[nz], np.asarray(F.inv(a))[nz])


def test_batch_inv_np_matches_host():
    F = KOALABEAR
    rng = np.random.default_rng(9)
    a = F.rand_np(rng, (33,))
    got = F.batch_inv_np(a)
    want = np.asarray(F.inv(a))
    np.testing.assert_array_equal(got, want)


def test_ext_inv_uses_batched_base():
    F = KOALABEAR
    E = KoalaBearExt4
    rng = np.random.default_rng(10)
    a = F.rand_np(rng, (17, 4))
    inv = np.asarray(E.inv(a))
    one = np.asarray(E.mul(a, inv))
    want = np.zeros_like(one)
    want[..., 0] = F.to_monty_h(1)
    np.testing.assert_array_equal(one, want)


@pytest.mark.parametrize("F", [KOALABEAR, BABYBEAR], ids=["kb", "bb"])
def test_tonelli_shanks_sqrt(F):
    rng = np.random.default_rng(11)
    found_residue = found_nonresidue = False
    for x in rng.integers(1, F.P, size=40, dtype=np.uint64):
        x = int(x)
        r = F.try_sqrt_h(x)
        if r is None:
            assert pow(x, (F.P - 1) // 2, F.P) == F.P - 1
            found_nonresidue = True
        else:
            assert (r * r) % F.P == x
            found_residue = True
    assert found_residue and found_nonresidue
    assert F.try_sqrt_h(0) == 0
