"""Binomial extension fields F[X]/(X^D - W) on a trailing axis of size D.

TPU-native equivalent of the reference's generic binomial extension
(`field/src/extension/binomial_extension.rs:62-300`): an extension element is
a uint32 array with a trailing axis of length D (Monty-form components). The
specialized D=4 mul kernel mirrors the algebra of `binomial_mul`
(`binomial_extension.rs:573`) — schoolbook convolution with the X^D = W fold —
but is expressed as unrolled jnp ops so XLA fuses it into surrounding code.

Inverse uses the Frobenius/norm method: with s = W^((P-1)/D) (DTH_ROOT),
Frobenius is the componentwise scaling a_i -> a_i s^i, and
a^{-1} = (a^p · a^{p^2} · ... · a^{p^{D-1}}) / Norm(a) with Norm(a) in the
base field — fully elementwise-parallel, no scans.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .monty31 import Monty31


@dataclass(frozen=True)
class BinomialExtension:
    base: Monty31
    D: int
    W: int  # standard-form int, small
    DTH_ROOT: int  # standard form: W^((P-1)/D)
    EXT_GENERATOR: tuple  # standard-form component tuple
    EXT_TWO_ADICITY: int

    @property
    def name(self):
        return f"{self.base.name}^[{self.D}]"

    # ------------------------------------------------------------------
    # host scalar math: elements are D-tuples of standard-form ints
    # ------------------------------------------------------------------
    def zero_h(self):
        return (0,) * self.D

    def one_h(self):
        return (1,) + (0,) * (self.D - 1)

    def from_base_h(self, x: int):
        return (x % self.base.P,) + (0,) * (self.D - 1)

    def add_h(self, a, b):
        p = self.base.P
        return tuple((x + y) % p for x, y in zip(a, b))

    def sub_h(self, a, b):
        p = self.base.P
        return tuple((x - y) % p for x, y in zip(a, b))

    def neg_h(self, a):
        p = self.base.P
        return tuple((-x) % p for x in a)

    def mul_h(self, a, b):
        p, d, w = self.base.P, self.D, self.W
        c = [0] * d
        for i in range(d):
            for j in range(d):
                k = i + j
                if k < d:
                    c[k] = (c[k] + a[i] * b[j]) % p
                else:
                    c[k - d] = (c[k - d] + w * a[i] * b[j]) % p
        return tuple(c)

    def base_mul_h(self, s: int, a):
        p = self.base.P
        return tuple((s * x) % p for x in a)

    def exp_h(self, a, e: int):
        acc = self.one_h()
        base = a
        while e:
            if e & 1:
                acc = self.mul_h(acc, base)
            base = self.mul_h(base, base)
            e >>= 1
        return acc

    def inv_h(self, a):
        # norm method (host): prod of nontrivial Frobenius conjugates / norm
        conj = a
        prod = None
        for _ in range(self.D - 1):
            conj = self.frobenius_h(conj)
            prod = conj if prod is None else self.mul_h(prod, conj)
        norm = self.mul_h(a, prod)
        assert all(x == 0 for x in norm[1:]), "norm must be in base field"
        ninv = self.base.inv_h(norm[0])
        return self.base_mul_h(ninv, prod)

    def frobenius_h(self, a, count: int = 1):
        p = self.base.P
        s = pow(self.DTH_ROOT, count, p)
        return tuple((a[i] * pow(s, i, p)) % p for i in range(self.D))

    def two_adic_generator_h(self, bits: int):
        """2^bits-th root of unity embedded from the base field.

        For bits <= base two-adicity this is the base chain embedded
        (matches `binomial_extension.rs` TwoAdicField impl which defers to
        base generators for small bits).
        """
        if bits <= self.base.TWO_ADICITY:
            return self.from_base_h(self.base.two_adic_generator_h(bits))
        raise NotImplementedError("extension-only two-adic roots not needed yet")

    # host <-> arrays
    def to_monty_np(self, a) -> np.ndarray:
        """Host tuple (standard ints) -> (D,) uint32 Monty array."""
        return np.array([self.base.to_monty_h(x) for x in a], dtype=np.uint32)

    def from_monty_np(self, arr) -> tuple:
        arr = np.asarray(arr, dtype=np.uint32).reshape(self.D)
        return tuple(self.base.from_monty_h(int(x)) for x in arr)

    # ------------------------------------------------------------------
    # device array math: (..., D) uint32 Monty arrays
    # ------------------------------------------------------------------
    def zeros(self, shape):
        return jnp.zeros(tuple(shape) + (self.D,), jnp.uint32)

    def from_base(self, x):
        """Embed base-field array (...,) into extension (..., D)."""
        pad = jnp.zeros(x.shape + (self.D - 1,), jnp.uint32)
        return jnp.concatenate([x[..., None], pad], axis=-1)

    def const(self, a_host):
        """Host tuple -> (D,) device constant."""
        return jnp.asarray(self.to_monty_np(a_host))

    def add(self, a, b):
        return self.base.add(a, b)

    def sub(self, a, b):
        return self.base.sub(a, b)

    def neg(self, a):
        return self.base.neg(a)

    def mul(self, a, b):
        """Ext mul on trailing axis (binomial_extension.rs:573 algebra)."""
        F, d, w = self.base, self.D, self.W
        comps_a = [a[..., i] for i in range(d)]
        comps_b = [b[..., i] for i in range(d)]
        out = [None] * d
        for i in range(d):
            for j in range(d):
                prod = F.mul(comps_a[i], comps_b[j])
                k = i + j
                if k >= d:
                    k -= d
                    prod = F.mul_small(prod, w)
                out[k] = prod if out[k] is None else F.add(out[k], prod)
        return jnp.stack(out, axis=-1)

    def square(self, a):
        return self.mul(a, a)

    def base_mul(self, s, a):
        """base-field array (...,) × ext array (..., D) -> ext."""
        return self.base.mul(s[..., None], a)

    # ---- numpy (host, exact) variants for small-tail prover work ----
    def add_np(self, a, b):
        return self.base.add_np(a, b)

    def sub_np(self, a, b):
        return self.base.sub_np(a, b)

    def mul_np(self, a, b):
        F, d, w = self.base, self.D, self.W
        a = np.asarray(a)
        b = np.asarray(b)
        out = [None] * d
        for i in range(d):
            for j in range(d):
                prod = F.mul_np(a[..., i], b[..., j])
                k = i + j
                if k >= d:
                    k -= d
                    prod = F.mul_np(
                        prod, np.uint32(F.to_monty_h(w % F.P))
                    )
                out[k] = prod if out[k] is None else F.add_np(out[k], prod)
        return np.stack(out, axis=-1)

    def base_mul_np(self, s, a):
        return self.base.mul_np(np.asarray(s)[..., None], np.asarray(a))

    def frobenius(self, a, count: int = 1):
        p = self.base.P
        s = pow(self.DTH_ROOT, count, p)
        scales = np.array(
            [self.base.to_monty_h(pow(s, i, p)) for i in range(self.D)],
            dtype=np.uint32,
        )
        return self.base.mul(a, jnp.asarray(scales))

    def inv(self, a):
        """Elementwise ext inverse via Frobenius norm (no scan, VPU only)."""
        conj = a
        prod = None
        for _ in range(self.D - 1):
            conj = self.frobenius(conj)
            prod = conj if prod is None else self.mul(prod, conj)
        norm = self.mul(a, prod)[..., 0]  # base field
        inv_fn = getattr(self.base, "batch_inv", self.base.inv)
        ninv = inv_fn(norm)
        return self.base_mul(ninv, prod)

    def exp(self, a, e: int):
        acc = None
        for bit in bin(e)[2:]:
            acc = a if acc is None else self.square(acc)
            if bit == "1" and acc is not a:
                acc = self.mul(acc, a)
        if acc is None:
            return jnp.broadcast_to(self.const(self.one_h()), a.shape)
        return acc

    def sum(self, x, axis=0):
        """Sum ext-valued array along a (non-component) axis."""
        if axis < 0:
            axis -= 1  # never the component axis
        return self.base.sum(x, axis=axis)

    def powers(self, z, count: int):
        """[1, z, z^2, ...] for a device ext scalar z: (count, D)."""
        out = [self.const(self.one_h())]
        for _ in range(count - 1):
            out.append(self.mul(out[-1], z))
        return jnp.stack(out, axis=0)

    def powers_np(self, a_host, count: int) -> np.ndarray:
        """Host powers as (count, D) uint32 Monty array (log-depth
        doubling: out[m:2m) = out[:m) · a^m, a^m squared per pass — the
        per-element host ext-mul loop cost ~15 ms at width 1312)."""
        out = np.zeros((max(count, 1), self.D), dtype=np.uint32)
        out[0] = self.to_monty_np(self.one_h())
        m = 1
        apow = a_host
        while m < count:
            k = min(m, count - m)
            out[m : m + k] = self.mul_np(
                out[:k], np.asarray(self.to_monty_np(apow))
            )
            m += k
            apow = self.mul_h(apow, apow)
        return out

    def rand_h(self, rng: np.random.Generator):
        return tuple(int(x) for x in rng.integers(0, self.base.P, self.D))
