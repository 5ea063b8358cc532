"""Mersenne-31 prime field (P = 2^31 - 1) on uint32 lanes.

Re-design of `mersenne-31/src/mersenne_31.rs`: no Montgomery form — the
"wire form" IS the canonical value (`to_monty_*` are canonicalizations so
the Monty31-shaped API keeps working for sponges/MMCS/NTT call sites).
Products reduce via the Mersenne identity 2^31 ≡ 1: a 62-bit product
(hi·2^31 + lo) folds to hi + lo (mersenne_31.rs:587 from_u62).

M31 is NOT two-adic (TWO_ADICITY = 0); its FFT story is the circle group
(ops/circle.py). EXT_TWO_ADIC_GENERATORS / CIRCLE_TWO_ADIC_GENERATORS are
copied verbatim from mersenne_31.rs:88 / complex.rs:16 (normative).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .monty31 import _mul_hi_lo

_U32 = np.uint32
_P = (1 << 31) - 1


@dataclass(frozen=True)
class Mersenne31Field:
    name: str = "Mersenne31"
    P: int = _P
    TWO_ADICITY: int = 0
    GENERATOR: int = 7

    # ---- host scalar math (canonical ints) ----
    def add_h(self, a, b):
        return (a + b) % _P

    def sub_h(self, a, b):
        return (a - b) % _P

    def mul_h(self, a, b):
        return (a * b) % _P

    def neg_h(self, a):
        return (-a) % _P

    def inv_h(self, a):
        return pow(a, _P - 2, _P)

    def exp_h(self, a, e):
        return pow(a, e, _P)

    def to_monty_h(self, x):
        return x % _P

    def from_monty_h(self, x):
        return x % _P

    def to_monty_np(self, x):
        return (np.asarray(x, dtype=np.uint64) % np.uint64(_P)).astype(_U32)

    from_monty_np = to_monty_np

    # ---- device ops (canonical uint32 in [0, P)) ----
    @property
    def dtype(self):
        return jnp.uint32

    def zeros(self, shape):
        return jnp.zeros(shape, jnp.uint32)

    def const(self, std_value: int):
        return jnp.uint32(std_value % _P)

    def add(self, a, b):
        s = a + b
        return jnp.where(s >= _U32(_P), s - _U32(_P), s)

    def sub(self, a, b):
        d = a - b
        return jnp.where(a < b, d + _U32(_P), d)

    def neg(self, a):
        return jnp.where(a == 0, a, _U32(_P) - a)

    def mul(self, a, b):
        hi, lo = _mul_hi_lo(a, b)  # prod = hi·2^32 + lo, < 2^62
        lo31 = lo & _U32(_P)
        hi31 = (lo >> 31) | (hi << 1)  # prod >> 31, < 2^31
        r = lo31 + hi31  # < 2^32
        r = (r & _U32(_P)) + (r >> 31)
        return jnp.where(r >= _U32(_P), r - _U32(_P), r)

    def square(self, a):
        return self.mul(a, a)

    def double(self, a):
        return self.add(a, a)

    def halve(self, a):
        odd = a & 1
        return jnp.where(
            odd == 1, (a >> 1) + _U32((_P + 1) // 2), a >> 1
        )

    def mul_small(self, a, k: int):
        k %= _P
        if k == 0:
            return jnp.zeros_like(a)
        if k.bit_length() > 5:
            return self.mul(a, self.const(k))
        acc = jnp.zeros_like(a)
        for bit in bin(k)[2:]:
            acc = self.double(acc)
            if bit == "1":
                acc = self.add(acc, a)
        return acc

    def exp(self, a, e: int):
        e %= _P - 1
        if e == 0:
            return jnp.full_like(a, _U32(1))
        acc = None
        for bit in bin(e)[2:]:
            acc = a if acc is None else self.square(acc)
            if bit == "1" and acc is not a:
                acc = self.mul(acc, a)
        return acc

    def inv(self, a):
        return self.exp(a, _P - 2)

    def batch_inv(self, a):
        """Amortized inverse (`field/src/batch_inverse.rs:29` analog)."""
        from .batch_inv import batch_inv

        return batch_inv(self, a)

    def batch_inv_np(self, a):
        from .batch_inv import batch_inv_np

        return batch_inv_np(self, a)

    def to_monty(self, x):
        return x

    def from_monty(self, x):
        return x

    def sum(self, x, axis=0):
        x = jnp.moveaxis(x, axis, 0)
        n = x.shape[0]
        while n > 1:
            half = n // 2
            s = self.add(x[:half], x[half : 2 * half])
            if n % 2:
                s = jnp.concatenate(
                    [self.add(s[:1], x[2 * half :]), s[1:]], axis=0
                )
            x = s
            n = x.shape[0]
        return x[0]

    # ---- numpy variants ----
    def add_np(self, a, b):
        s = a.astype(_U32) + b
        return np.where(s >= _U32(_P), s - _U32(_P), s)

    def sub_np(self, a, b):
        d = a.astype(_U32) - b
        return np.where(a < b, d + _U32(_P), d)

    def mul_np(self, a, b):
        full = a.astype(np.uint64) * b.astype(np.uint64)
        return (full % np.uint64(_P)).astype(_U32)

    def square_np(self, a):
        return self.mul_np(a, a)

    def double_np(self, a):
        return self.add_np(a, a)

    def halve_np(self, a):
        return np.where(
            (a & 1) == 1, (a >> 1) + _U32((_P + 1) // 2), a >> 1
        )

    def sum_np(self, x, axis=0):
        return (
            x.astype(np.uint64).sum(axis=axis) % np.uint64(_P)
        ).astype(_U32)

    # ---- misc (Monty31 API parity) ----
    def powers_np(self, base_std: int, count: int, monty: bool = True):
        out = np.empty(count, dtype=_U32)
        acc = 1
        for i in range(count):
            out[i] = acc
            acc = (acc * base_std) % _P
        return out

    def rand_np(self, rng: np.random.Generator, shape, monty: bool = True):
        return rng.integers(0, _P, size=shape, dtype=np.uint32)


Mersenne31 = Mersenne31Field()

# Generators of the order-2^i subgroups of the unit circle
# x^2 + y^2 = 1 over M31 (complex.rs:16 CIRCLE_TWO_ADIC_GENERATORS,
# normative for the circle FFT domain).
CIRCLE_TWO_ADIC_GENERATORS = (
    (1, 0),
    (2147483646, 0),
    (0, 2147483646),
    (32768, 2147450879),
    (590768354, 978592373),
    (1179735656, 1241207368),
    (1567857810, 456695729),
    (1774253895, 1309288441),
    (736262640, 1553669210),
    (1819216575, 1662816114),
    (1323191254, 1936974060),
    (605622498, 1964232216),
    (343674985, 501786993),
    (1995316534, 149306621),
    (2107600913, 1378821388),
    (541476169, 2101081972),
    (2135874973, 483411332),
    (2097144245, 1684033590),
    (1662322247, 670236780),
    (1172215635, 595888646),
    (241940101, 323856519),
    (1957194259, 2139647100),
    (1957419629, 1541039442),
    (1062045235, 1824580421),
    (1929382196, 1664698822),
    (1889294251, 331248939),
    (1214231414, 1646302518),
    (1765392370, 461136547),
    (1629751483, 66485474),
    (1501355827, 1439063420),
    (509778402, 800467507),
    (311014874, 1584694829),
)


def m31_cubic_extension():
    """The M31 cubic binomial extension F[X]/(X³−5)
    (`mersenne-31/src/extension.rs:21-38`: W=5, DTH_ROOT=1513477735,
    EXT_GENERATOR=[10,1,0]) — the circle-fixture challenge field."""
    from .extension import BinomialExtension

    return BinomialExtension(
        base=Mersenne31,
        D=3,
        W=5,
        DTH_ROOT=1513477735,
        EXT_GENERATOR=(10, 1, 0),
        EXT_TWO_ADICITY=1,
    )


M31Ext3 = m31_cubic_extension()
