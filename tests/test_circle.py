"""Circle FFT: M31 field axioms, basis/transform consistency, round-trips.

Mirrors the reference's cfft tests (`circle/src/cfft.rs` tests: fft_test /
extrapolation vs naive basis evaluation).
"""

import numpy as np
import pytest

from plonky3_tpu.fields.mersenne31 import Mersenne31 as F
from plonky3_tpu.ops.circle import (
    CircleDomain,
    cfft_evaluate,
    cfft_interpolate,
    cfft_perm_indices,
    circle_basis_host,
    pt_add,
    pt_generator,
    pt_mul,
    pt_v_n,
)

P = F.P


def test_m31_field_ops(rng):
    import jax.numpy as jnp

    a = F.rand_np(rng, (200,))
    b = F.rand_np(rng, (200,))
    am, bm = jnp.asarray(a), jnp.asarray(b)
    np.testing.assert_array_equal(
        np.asarray(F.mul(am, bm)),
        (a.astype(np.uint64) * b) % np.uint64(P),
    )
    np.testing.assert_array_equal(
        np.asarray(F.add(am, bm)), (a.astype(np.uint64) + b) % np.uint64(P)
    )
    # inverse
    nz = a[a != 0][:50]
    inv = np.asarray(F.inv(jnp.asarray(nz)))
    np.testing.assert_array_equal(
        (nz.astype(np.uint64) * inv) % np.uint64(P), np.ones(len(nz))
    )
    # halve
    h = np.asarray(F.halve(am))
    np.testing.assert_array_equal(
        (h.astype(np.uint64) * 2) % np.uint64(P), a
    )


def test_circle_generators_on_curve():
    for i, (x, y) in enumerate(
        [pt_generator(i) for i in range(10)]
    ):
        assert (x * x + y * y) % P == 1
        # order check: generator(i) has order 2^i
        if i >= 1:
            sq = pt_mul((x, y), 1 << (i - 1))
            assert sq == (P - 1, 0), i  # order-2 element
    g5 = pt_generator(5)
    assert pt_mul(g5, 32) == (1, 0)


@pytest.mark.parametrize("log_n", [1, 2, 3, 5])
def test_interpolate_matches_basis(rng, log_n):
    """interpolate(evals) gives coefficients in circle_basis order."""
    import jax.numpy as jnp

    domain = CircleDomain.standard(log_n)
    n = 1 << log_n
    vals_nat = F.rand_np(rng, (n, 3))
    perm = cfft_perm_indices(log_n)
    vals_cfft = vals_nat[perm]
    coeffs = np.asarray(cfft_interpolate(domain, jnp.asarray(vals_cfft)))
    pts = domain.points_natural()
    for j in range(n):
        basis = circle_basis_host(pts[j], log_n)
        for c in range(3):
            got = sum(
                int(coeffs[i, c]) * basis[i] for i in range(n)
            ) % P
            assert got == int(vals_nat[j, c]), (j, c)


@pytest.mark.parametrize("log_n", [1, 3, 6])
def test_evaluate_roundtrip(rng, log_n):
    import jax.numpy as jnp

    domain = CircleDomain.standard(log_n)
    n = 1 << log_n
    vals = jnp.asarray(F.rand_np(rng, (n, 4)))
    coeffs = cfft_interpolate(domain, vals)
    back = cfft_evaluate(domain, coeffs)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))


@pytest.mark.parametrize("log_n,log_blowup", [(3, 1), (4, 2)])
def test_extrapolate(rng, log_n, log_blowup):
    """LDE: evaluate small-domain coeffs on a larger standard domain and
    check against direct basis evaluation (cfft.rs extrapolation test)."""
    import jax.numpy as jnp

    small = CircleDomain.standard(log_n)
    big = CircleDomain.standard(log_n + log_blowup)
    n = 1 << log_n
    vals = F.rand_np(rng, (n, 2))
    coeffs = cfft_interpolate(small, jnp.asarray(vals))
    lde_cfft = np.asarray(cfft_evaluate(big, coeffs))
    perm = cfft_perm_indices(big.log_n)
    lde_nat = lde_cfft[perm]  # cfft perm is an involution
    pts = big.points_natural()
    cnp = np.asarray(coeffs)
    for j in rng.choice(big.size, 8, replace=False):
        basis = circle_basis_host(pts[j], log_n)
        for c in range(2):
            expect = sum(
                int(cnp[i, c]) * basis[i] for i in range(n)
            ) % P
            assert int(lde_nat[j, c]) == expect
