"""NTT tests vs an exact naive host DFT (model: field-testing dft_testing.rs:
every impl checked against NaiveDft, dft∘idft = id, LDE = padded DFT)."""

import numpy as np
import pytest
import jax.numpy as jnp

from plonky3_tpu.fields import BabyBear, KoalaBear
from plonky3_tpu.ops.ntt import (
    coset_lde_batch,
    dft,
    dft_natural_to_bitrev,
    idft,
    powers_device,
)
from plonky3_tpu.utils.bits import bitrev_indices

FIELDS = [KoalaBear, BabyBear]


def naive_dft_host(F, mat_std: np.ndarray, shift: int = 1) -> np.ndarray:
    """Exact O(n^2) DFT of each column over coset shift·<g_n> (host ints)."""
    n, w = mat_std.shape
    g = F.two_adic_generator_h(n.bit_length() - 1)
    out = np.zeros_like(mat_std)
    for k in range(n):
        x = F.mul_h(shift, F.exp_h(g, k))
        acc = [0] * w
        xp = 1
        for i in range(n):
            for j in range(w):
                acc[j] = (acc[j] + int(mat_std[i, j]) * xp) % F.P
            xp = F.mul_h(xp, x)
        out[k] = acc
    return out


def naive_interpolate_then_eval(F, evals_std, added_bits, shift):
    """LDE oracle: idft (on subgroup) then eval on shift·K via naive DFT."""
    n = evals_std.shape[0]
    # coefficients via inverse naive dft
    g_inv = F.inv_h(F.two_adic_generator_h(n.bit_length() - 1))
    n_inv = F.inv_h(n)
    coeffs = np.zeros_like(evals_std)
    for k in range(n):
        acc = [0] * evals_std.shape[1]
        xp = 1
        x = F.exp_h(g_inv, k)
        for i in range(n):
            for j in range(evals_std.shape[1]):
                acc[j] = (acc[j] + int(evals_std[i, j]) * xp) % F.P
            xp = F.mul_h(xp, x)
        coeffs[k] = [F.mul_h(a, n_inv) for a in acc]
    big = np.zeros((n << added_bits, evals_std.shape[1]), dtype=evals_std.dtype)
    big[:n] = coeffs
    return naive_dft_host(F, big, shift)


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("log_n", [0, 1, 3, 6])
def test_dft_vs_naive(F, log_n, rng):
    n, w = 1 << log_n, 3
    mat = rng.integers(0, F.P, (n, w), dtype=np.uint64).astype(np.uint32)
    want = naive_dft_host(F, mat)
    got_m = np.asarray(dft(F, jnp.asarray(F.to_monty_np(mat))))
    np.testing.assert_array_equal(F.from_monty_np(got_m), want)


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("log_n", [1, 4, 8])
def test_dft_idft_roundtrip(F, log_n, rng):
    n, w = 1 << log_n, 5
    mat = F.rand_np(rng, (n, w))
    back = np.asarray(idft(F, dft(F, jnp.asarray(mat))))
    np.testing.assert_array_equal(back, mat)


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_bitrev_output_order(F, rng):
    n, w = 32, 2
    mat = F.rand_np(rng, (n, w))
    nat = np.asarray(dft(F, jnp.asarray(mat)))
    br = np.asarray(dft_natural_to_bitrev(F, jnp.asarray(mat)))
    np.testing.assert_array_equal(br, nat[bitrev_indices(5)])


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("added_bits,shift_kind", [(1, "gen"), (2, "gen"), (1, "one")])
def test_coset_lde_vs_naive(F, added_bits, shift_kind, rng):
    n, w = 16, 3
    shift = F.GENERATOR if shift_kind == "gen" else 1
    mat = rng.integers(0, F.P, (n, w), dtype=np.uint64).astype(np.uint32)
    want = naive_interpolate_then_eval(F, mat, added_bits, shift)
    got = np.asarray(
        coset_lde_batch(
            F, jnp.asarray(F.to_monty_np(mat)), added_bits, shift,
            out_order="natural",
        )
    )
    np.testing.assert_array_equal(F.from_monty_np(got), want)
    # bitrev output agrees with natural output permuted
    got_br = np.asarray(
        coset_lde_batch(F, jnp.asarray(F.to_monty_np(mat)), added_bits, shift)
    )
    np.testing.assert_array_equal(
        F.from_monty_np(got_br[bitrev_indices(4 + added_bits)]), want
    )


def test_lde_preserves_original_points(rng):
    """LDE with shift=1 contains original evals at stride-2^b positions."""
    F = KoalaBear
    n, b = 64, 1
    mat = F.rand_np(rng, (n, 2))
    lde = np.asarray(
        coset_lde_batch(F, jnp.asarray(mat), b, 1, out_order="natural")
    )
    np.testing.assert_array_equal(lde[:: 1 << b], mat)


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_powers_device(F, rng):
    base = int(rng.integers(1, F.P))
    got = F.from_monty_np(np.asarray(powers_device(F, base, 64, scale_std=7)))
    want = np.array(
        [(7 * pow(base, i, F.P)) % F.P for i in range(64)], np.uint32
    )
    np.testing.assert_array_equal(got, want)


def test_ext_valued_dft(rng):
    """DFT broadcasts over trailing axes: (n, w, D) == D stacked base DFTs."""
    F = KoalaBear
    n, w, D = 16, 2, 4
    mat = F.rand_np(rng, (n, w, D))
    full = np.asarray(dft(F, jnp.asarray(mat)))
    for d in range(D):
        comp = np.asarray(dft(F, jnp.asarray(mat[..., d])))
        np.testing.assert_array_equal(full[..., d], comp)
