"""Mersenne31 real->complex DFT (model: mersenne-31/src/dft.rs tests:
consistency + convolution)."""

import numpy as np

from plonky3_tpu.ops.m31_dft import (
    _cm_generator,
    m31_dft_batch,
    m31_idft_batch,
)

P = (1 << 31) - 1


def _cmul(a, b):
    return (
        (a[0] * b[0] - a[1] * b[1]) % P,
        (a[0] * b[1] + a[1] * b[0]) % P,
    )


def test_cm31_two_adic_generator():
    g = _cm_generator(32)
    x = g
    for _ in range(31):
        x = _cmul(x, x)
    assert x == (P - 1, 0)  # g^(2^31) = -1 => order exactly 2^32


def test_dft_roundtrip():
    rng = np.random.default_rng(0)
    for h, w in [(4, 1), (16, 3), (64, 2)]:
        mat = rng.integers(0, P, (h, w)).astype(np.uint32)
        assert (m31_idft_batch(m31_dft_batch(mat)) == mat).all()


def test_convolution_theorem():
    """dft.rs:227 — pointwise spectrum product = cyclic convolution."""
    rng = np.random.default_rng(1)
    n = 32
    a = rng.integers(0, P, (n, 1)).astype(np.uint32)
    b = rng.integers(0, P, (n, 1)).astype(np.uint32)
    sa, sb = m31_dft_batch(a), m31_dft_batch(b)
    Pu = np.uint64(P)
    re = (sa[..., 0] * sb[..., 0] % Pu + Pu - sa[..., 1] * sb[..., 1] % Pu) % Pu
    im = (sa[..., 0] * sb[..., 1] + sa[..., 1] * sb[..., 0]) % Pu
    conv = m31_idft_batch(np.stack([re, im], axis=-1))
    want = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        for j in range(n):
            want[(i + j) % n] = (
                want[(i + j) % n] + int(a[i, 0]) * int(b[j, 0])
            ) % P
    assert (conv[:, 0].astype(np.uint64) == want).all()
