"""Goldilocks field adapters — the (lo, hi) u32 limb-pair device story.

The 31-bit fields ride the generic Monty31 machinery (one u32 lane per
element). Goldilocks (P = 2^64 - 2^32 + 1, goldilocks/src/goldilocks.rs)
needs two u32 lanes per element on TPU, so the GL stack carries:

  * math form: a pair `(lo, hi)` of uint32 arrays (fields/
    goldilocks_device.py kernels operate on these — hot loops never pay
    stride-2 lane shuffles);
  * wire/storage form: ONE uint32 array whose last axis interleaves
    limbs `[lo0, hi0, lo1, hi1, ...]` — what Merkle commits hash and
    what proofs serialize. `depair`/`repair` convert (pure reshapes).

`GLBaseField` / `GLExt2Field` expose the same method surface the generic
protocol code expects of a field module (`from_monty_np`, `add`,
`mul_np`, `powers_np`, ...), with "Monty form" meaning "interleaved
limb-split" (Goldilocks has no Montgomery representation here; host
form is canonical u64 / python int). The degree-2 extension is
X^2 - 7 (goldilocks/src/extension.rs:22-48).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..fields import goldilocks_device as gd
from ..fields.goldilocks import Goldilocks, GoldilocksExt2Field

_P = Goldilocks.P
_W = 7  # extension defining constant: X^2 - 7


# ---------------------------------------------------------------------------
# wire <-> math form
# ---------------------------------------------------------------------------
def depair(x):
    """Interleaved u32 (..., 2k) -> ((..., k) lo, (..., k) hi)."""
    v = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
    return v[..., 0], v[..., 1]


def repair(lo, hi):
    """((..., k) lo, hi) -> interleaved u32 (..., 2k)."""
    v = jnp.stack([lo, hi], axis=-1)
    return v.reshape(v.shape[:-2] + (v.shape[-2] * 2,))


def depair_np(x):
    x = np.asarray(x)
    v = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
    return v[..., 0], v[..., 1]


def repair_np(lo, hi):
    v = np.stack([np.asarray(lo), np.asarray(hi)], axis=-1)
    return v.reshape(v.shape[:-2] + (v.shape[-2] * 2,))


def split_host(x64):
    """u64 host array -> interleaved u32 array (trailing axis doubled)."""
    x64 = np.asarray(x64, np.uint64)
    lo = (x64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (x64 >> np.uint64(32)).astype(np.uint32)
    return repair_np(lo, hi)


def join_host(x32):
    """Interleaved u32 array -> u64 host array (trailing axis halved)."""
    lo, hi = depair_np(x32)
    return lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))


# ---------------------------------------------------------------------------
# extra device kernels over (lo, hi) pairs
# ---------------------------------------------------------------------------
def mul7(a):
    """7·a via an add chain (cheaper than a full 32x32 limb mul)."""
    d = gd.double(a)           # 2a
    t = gd.add(d, a)           # 3a
    return gd.add(gd.double(t), a)  # 7a


_INV2 = (_P + 1) // 2


def halve(a):
    """a/2 (multiply by the constant 2^-1)."""
    return gd.mul(a, gd.const(_INV2))


def inv_device(a):
    """a^(P-2) by square-and-multiply (vectorized over the array).

    ~127 GL muls; used for the per-point 1/(z-x) and selector-denominator
    tables (one-time per opening point), not in per-row hot loops.
    """
    e = _P - 2
    acc = None
    base = a
    while e:
        if e & 1:
            acc = base if acc is None else gd.mul(acc, base)
        e >>= 1
        if e:
            base = gd.square(base)
    return acc


def sum_axis(pair, axis: int):
    """Sum of GL pair array along `axis` via a log-depth add tree."""
    lo, hi = pair
    lo = jnp.moveaxis(lo, axis, 0)
    hi = jnp.moveaxis(hi, axis, 0)
    n = lo.shape[0]
    while n > 1:
        half = n // 2
        odd = n - 2 * half
        a = (lo[:half], hi[:half])
        b = (lo[half : 2 * half], hi[half : 2 * half])
        s = gd.add(a, b)
        if odd:
            lo = jnp.concatenate([s[0], lo[2 * half :]], axis=0)
            hi = jnp.concatenate([s[1], hi[2 * half :]], axis=0)
        else:
            lo, hi = s
        n = half + odd
    return lo[0], hi[0]


# ---- degree-2 extension: value = (x0, x1) where each xi is a pair ----
def ext_add(a, b):
    return (gd.add(a[0], b[0]), gd.add(a[1], b[1]))


def ext_sub(a, b):
    return (gd.sub(a[0], b[0]), gd.sub(a[1], b[1]))


def ext_neg(a):
    return (gd.neg(a[0]), gd.neg(a[1]))


def ext_mul(a, b):
    """(a0 + a1·X)(b0 + b1·X) mod X^2 - 7."""
    t00 = gd.mul(a[0], b[0])
    t11 = gd.mul(a[1], b[1])
    c0 = gd.add(t00, mul7(t11))
    c1 = gd.add(gd.mul(a[0], b[1]), gd.mul(a[1], b[0]))
    return (c0, c1)


def ext_base_mul(s, a):
    """base pair s times ext a."""
    return (gd.mul(s, a[0]), gd.mul(s, a[1]))


def ext_inv_device(a):
    """Norm inverse: a^-1 = conj(a)/N(a), N = a0^2 - 7·a1^2."""
    norm = gd.sub(gd.square(a[0]), mul7(gd.square(a[1])))
    ninv = inv_device(norm)
    return (gd.mul(a[0], ninv), gd.mul(gd.neg(a[1]), ninv))


# ---------------------------------------------------------------------------
# host power tables (exact, vectorized via the u64 limb numpy ops)
# ---------------------------------------------------------------------------
_POWER_CACHE: dict = {}


def powers_host(base: int, n: int, scale: int = 1) -> np.ndarray:
    """[s, s·b, ..., s·b^(n-1)] as u64 numpy (log-doubling, exact)."""
    key = (base % _P, n, scale % _P)
    p = _POWER_CACHE.get(key)
    if p is None:
        p = np.array([scale % _P], dtype=np.uint64)
        cur = base % _P
        while p.shape[0] < n:
            p = np.concatenate(
                [p, Goldilocks.mul_np(p, np.uint64(cur))]
            )
            cur = (cur * cur) % _P
        p = p[:n]
        _POWER_CACHE[key] = p
    return p


def powers_pair_device(base: int, n: int, scale: int = 1):
    """Device (lo, hi) pair of the host power table."""
    p = powers_host(base, n, scale)
    return (
        jnp.asarray((p & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((p >> np.uint64(32)).astype(np.uint32)),
    )


# ---------------------------------------------------------------------------
# field adapter classes (duck-typed like Monty31 / BinomialExtension for
# the protocol layers that the GL stack reuses)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class GLBaseField:
    name: str = "GoldilocksDevice"
    P: int = _P
    TWO_ADICITY: int = 32
    GENERATOR: int = 7

    # ---- host scalar ops (delegate to the exact int field) ----
    def add_h(self, a, b):
        return Goldilocks.add_h(a, b)

    def sub_h(self, a, b):
        return Goldilocks.sub_h(a, b)

    def mul_h(self, a, b):
        return Goldilocks.mul_h(a, b)

    def neg_h(self, a):
        return Goldilocks.neg_h(a)

    def inv_h(self, a):
        return Goldilocks.inv_h(a)

    def exp_h(self, a, e):
        return Goldilocks.exp_h(a, e)

    def two_adic_generator_h(self, bits):
        return Goldilocks.two_adic_generator_h(bits)

    # ---- wire-form conversions ("monty" = interleaved limb pairs) ----
    def from_monty_np(self, arr):
        return join_host(np.asarray(arr))

    def to_monty_np(self, arr):
        return split_host(np.asarray(arr, dtype=np.uint64))

    # ---- device ops on interleaved wire-form arrays ----
    def add(self, a, b):
        return repair(*gd.add(depair(a), depair(b)))

    def sub(self, a, b):
        return repair(*gd.sub(depair(a), depair(b)))

    def mul(self, a, b):
        return repair(*gd.mul(depair(a), depair(b)))

    def neg(self, a):
        return repair(*gd.neg(depair(a)))

    def halve(self, a):
        return repair(*halve(depair(a)))

    # ---- host numpy ops on interleaved wire-form arrays ----
    def add_np(self, a, b):
        return split_host(Goldilocks.add_np(join_host(a), join_host(b)))

    def sub_np(self, a, b):
        return split_host(Goldilocks.sub_np(join_host(a), join_host(b)))

    def mul_np(self, a, b):
        return split_host(Goldilocks.mul_np(join_host(a), join_host(b)))

    def halve_np(self, a):
        v = Goldilocks.mul_np(join_host(a), np.uint64(_INV2))
        return split_host(v)

    def rand_np(self, rng, shape):
        return Goldilocks.rand_np(rng, shape)


@dataclass(frozen=True)
class GLExt2Field:
    """GL[X]/(X^2-7) adapter. D = 2 field coordinates; NCOLS = 4 u32 wire
    columns per element (protocol code uses NCOLS for array widths and D
    for transcript sampling — see fri/prover.py)."""

    D: int = 2
    NCOLS: int = 4
    W: int = _W

    @property
    def base(self):
        return GLF

    @property
    def P(self):
        return _P

    # ---- host ext-tuple ops ----
    def zero_h(self):
        return (0, 0)

    def one_h(self):
        return (1, 0)

    def from_base_h(self, x):
        return (int(x) % _P, 0)

    def add_h(self, a, b):
        return GoldilocksExt2Field.add_h(a, b)

    def sub_h(self, a, b):
        return GoldilocksExt2Field.sub_h(a, b)

    def mul_h(self, a, b):
        return GoldilocksExt2Field.mul_h(a, b)

    def neg_h(self, a):
        return GoldilocksExt2Field.neg_h(a)

    def base_mul_h(self, s, a):
        return GoldilocksExt2Field.base_mul_h(s, a)

    def inv_h(self, a):
        return GoldilocksExt2Field.inv_h(a)

    def exp_h(self, a, e):
        return GoldilocksExt2Field.exp_h(a, e)

    # ---- wire conversions: ext tuple <-> (4,) interleaved u32 ----
    def to_monty_np(self, ext):
        arr = np.asarray(ext, dtype=np.uint64)
        return split_host(arr)

    def from_monty_np(self, arr):
        return join_host(np.asarray(arr))

    def powers_np(self, alpha, n: int):
        """(n, 4) interleaved host array of [1, α, α^2, ...]."""
        out = np.empty((n, 2), dtype=np.uint64)
        cur = self.one_h()
        for i in range(n):
            out[i] = cur
            cur = self.mul_h(cur, alpha)
        return split_host(out)

    # ---- device ops on interleaved (..., 4) wire arrays ----
    @staticmethod
    def _cols(x):
        """Wire (..., 4) -> ext-of-pairs (((..,), (..,)), ((..,), (..,)))."""
        lo, hi = depair(x)  # (..., 2) each
        return (
            (lo[..., 0], hi[..., 0]),
            (lo[..., 1], hi[..., 1]),
        )

    @staticmethod
    def _wire(e):
        (l0, h0), (l1, h1) = e
        return jnp.stack([l0, h0, l1, h1], axis=-1)

    def mul(self, a, b):
        av, bv = self._cols(a), self._cols(jnp.broadcast_to(b, a.shape))
        return self._wire(ext_mul(av, bv))

    def add(self, a, b):
        return GLF.add(a, b)

    def base_mul(self, s_pair, a):
        """s: (lo, hi) base pair broadcastable over a's leading axes."""
        av = self._cols(a)
        return self._wire(ext_base_mul(s_pair, av))

    # ---- host numpy ops on interleaved wire arrays ----
    def mul_np(self, a, b):
        a64 = join_host(np.asarray(a))  # (..., 2) u64
        b64 = join_host(np.asarray(b))
        b64 = np.broadcast_to(b64, a64.shape)
        G = Goldilocks
        c0 = G.add_np(
            G.mul_np(a64[..., 0], b64[..., 0]),
            G.mul_np(np.uint64(_W), G.mul_np(a64[..., 1], b64[..., 1])),
        )
        c1 = G.add_np(
            G.mul_np(a64[..., 0], b64[..., 1]),
            G.mul_np(a64[..., 1], b64[..., 0]),
        )
        return split_host(np.stack([c0, c1], axis=-1))


GLF = GLBaseField()
GLE = GLExt2Field()
