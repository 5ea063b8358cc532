"""Four-step pallas DIF (ops/ntt_pallas.py) vs the XLA radix-8 network
(ops/ntt.py:_dif): bit-identical output, both directions, including
non-128-multiple widths and odd log_n splits.

Runs the pallas kernels in interpret mode on the CPU mesh; the chip
path is exercised by bench.py and the fixture suite."""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_tpu.fields import KoalaBear as F, BabyBear
from plonky3_tpu.ops.ntt import _dif
from plonky3_tpu.ops.ntt_pallas import dif_fused


@pytest.mark.parametrize(
    "field,log_n,w,inverse",
    [
        (F, 6, 5, False),
        (F, 6, 5, True),
        (F, 9, 128, False),  # odd log_n: log_a != log_b
        (F, 9, 128, True),
        (F, 13, 200, False),  # the _dif gate threshold shape class
        (BabyBear, 8, 37, False),
        (BabyBear, 8, 37, True),
    ],
)
def test_dif_fused_bit_identical(field, log_n, w, inverse):
    rng = np.random.default_rng(log_n * 31 + w)
    x = jnp.asarray(field.rand_np(rng, (1 << log_n, w)))
    got = dif_fused(field, x, log_n, inverse)
    want = _dif(field, x, log_n, inverse)
    assert jnp.array_equal(got, want)


@pytest.mark.parametrize("log_n,w", [(6, 5), (9, 128), (13, 200)])
def test_dif_fused_zero_top(log_n, w):
    """zero_top (implicit zero upper half — the coset-LDE forward pad)
    must match an explicit zero pad bit-for-bit."""
    rng = np.random.default_rng(log_n * 7 + w)
    half = jnp.asarray(F.rand_np(rng, (1 << (log_n - 1), w)))
    padded = jnp.concatenate([half, jnp.zeros_like(half)], axis=0)
    got = dif_fused(F, half, log_n, False, zero_top=True)
    want = _dif(F, padded, log_n, False)
    assert jnp.array_equal(got, want)
