"""31-bit Montgomery prime fields on uint32 lanes.

TPU-native re-design of the reference's `monty-31` crate
(`monty-31/src/monty_31.rs:37`, `monty-31/src/utils.rs:61-126`): field
elements live on device as `uint32` arrays in Montgomery form (value·2^32
mod P). The TPU VPU has no 32x32->64 widening multiply, so the 64-bit
product is built from 16-bit limb products — every intermediate fits in
uint32 and the whole mul is ~25 VPU ops, identical semantics on CPU and TPU.

The Montgomery reduction contract matches `monty_reduce`
(`monty-31/src/utils.rs:103-126`): t = x·MU mod 2^32 (MU = P^-1 mod 2^32),
u = t·P, result = (x - u) >> 32, plus P on borrow; output in [0, P).

Host-side scalar math (transcript, verifier, twiddle precompute) uses exact
Python integers in *standard* form; `to_monty`/`from_monty` convert at the
boundary. Serialization is Monty form, matching `monty_31.rs:167-184`.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from functools import partial, reduce

import jax.numpy as jnp
import numpy as np

_U32 = np.uint32
_MASK16 = 0xFFFF


def _mul_hi_lo(a, b):
    """Full 64-bit product of two uint32 arrays as (hi, lo) uint32 pair.

    Requires at least one operand < 2^31 so the cross-term sum cannot
    double-overflow (always true here: one side is < P < 2^31).
    """
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    ll = a0 * b0
    m1 = a1 * b0
    mid = m1 + a0 * b1  # may wrap once; carry recovered below
    mid_c = (mid < m1).astype(jnp.uint32)
    lo = ll + (mid << 16)
    lo_c = (lo < ll).astype(jnp.uint32)
    hi = a1 * b1 + (mid >> 16) + (mid_c << 16) + lo_c
    return hi, lo


@dataclass(frozen=True)
class Monty31:
    """A concrete 31-bit Montgomery field (instantiated as KoalaBear etc.).

    All array ops take/return jnp uint32 arrays in Monty form, canonical
    range [0, P). All `*_h` host helpers use python ints in standard form.
    """

    name: str
    P: int  # the prime
    MU: int  # P^-1 mod 2^32
    TWO_ADICITY: int
    GENERATOR: int  # multiplicative generator (standard form int)
    # TWO_ADIC_GENERATORS[i] is a 2^i-th root of unity (standard form ints),
    # squaring-consistent: g[i]^2 == g[i-1]. Normative, from the reference.
    TWO_ADIC_GENERATORS: tuple = ()

    # ---- derived (computed in __post_init__) ----
    R: int = dc_field(init=False)  # 2^32 mod P
    R2: int = dc_field(init=False)  # 2^64 mod P

    def __post_init__(self):
        object.__setattr__(self, "R", (1 << 32) % self.P)
        object.__setattr__(self, "R2", (1 << 64) % self.P)
        assert (self.P * self.MU) & 0xFFFFFFFF == 1, "MU must be P^-1 mod 2^32"

    # ------------------------------------------------------------------
    # host scalar math (standard form python ints)
    # ------------------------------------------------------------------
    def add_h(self, a: int, b: int) -> int:
        return (a + b) % self.P

    def sub_h(self, a: int, b: int) -> int:
        return (a - b) % self.P

    def mul_h(self, a: int, b: int) -> int:
        return (a * b) % self.P

    def neg_h(self, a: int) -> int:
        return (-a) % self.P

    def inv_h(self, a: int) -> int:
        if a % self.P == 0:
            raise ZeroDivisionError("field inverse of zero")
        return pow(a, self.P - 2, self.P)

    def exp_h(self, a: int, e: int) -> int:
        return pow(a, e, self.P)

    def two_adic_generator_h(self, bits: int) -> int:
        """Standard-form 2^bits-th root of unity (field.rs:1267 contract)."""
        if bits > self.TWO_ADICITY:
            raise ValueError(f"bits {bits} > two-adicity {self.TWO_ADICITY}")
        return self.TWO_ADIC_GENERATORS[bits]

    def to_monty_h(self, x: int) -> int:
        return (x << 32) % self.P

    def from_monty_h(self, x: int) -> int:
        # x · 2^-32 mod P
        return (x * pow(self.R, self.P - 2, self.P)) % self.P

    # ------------------------------------------------------------------
    # host vector conversions (numpy; used at trace/proof boundaries)
    # ------------------------------------------------------------------
    def to_monty_np(self, x: np.ndarray) -> np.ndarray:
        """Standard-form uint array -> Monty-form uint32 (host numpy)."""
        return ((x.astype(np.uint64) << np.uint64(32)) % np.uint64(self.P)).astype(
            _U32
        )

    def from_monty_np(self, x: np.ndarray) -> np.ndarray:
        rinv = pow(self.R, self.P - 2, self.P)
        return (
            (x.astype(np.uint64) * np.uint64(rinv)) % np.uint64(self.P)
        ).astype(_U32)

    # ------------------------------------------------------------------
    # device array math (jnp uint32, Monty form)
    # ------------------------------------------------------------------
    @property
    def dtype(self):
        return jnp.uint32

    def zeros(self, shape):
        return jnp.zeros(shape, jnp.uint32)

    def full(self, shape, std_value: int):
        """Array filled with a standard-form constant (converted to Monty)."""
        return jnp.full(shape, _U32(self.to_monty_h(std_value)), jnp.uint32)

    def const(self, std_value: int):
        return jnp.uint32(self.to_monty_h(std_value % self.P))

    def add(self, a, b):
        # overflow-free: a, b < P < 2^31 so a+b < 2^32 (utils.rs:61-86)
        s = a + b
        return jnp.where(s >= _U32(self.P), s - _U32(self.P), s)

    def sub(self, a, b):
        d = a - b  # wraps mod 2^32 when a < b
        return jnp.where(a < b, d + _U32(self.P), d)

    def neg(self, a):
        return jnp.where(a == 0, a, _U32(self.P) - a)

    def mul(self, a, b):
        """Monty product: a·b·2^-32 mod P, output canonical [0, P)."""
        hi, lo = _mul_hi_lo(a, b)
        t = lo * _U32(self.MU)
        u_hi, _ = _mul_hi_lo(t, _U32(self.P))
        r = hi - u_hi
        return jnp.where(hi < u_hi, r + _U32(self.P), r)

    def mul_shoup(self, a, w_std, w_sh):
        """Shoup modular product a·w mod P for a CONSTANT multiplier w.

        w_std is w in standard form, w_sh = floor(w·2^32/P) its Shoup
        precomputation (see `shoup_np`). For a in Monty form (x·R) the
        result x·w·R stays in Monty form — identical to `mul` with the
        Monty-form twiddle. ~16 VPU ops vs ~26 for the generic Monty mul
        (q = hi32(a·w_sh) is off by at most 1 from floor(a·w/P), so
        r = a·w − q·P lands in [0, 2P) and one conditional subtract
        canonicalizes — exact, not approximate)."""
        q, _ = _mul_hi_lo(a, w_sh)
        r = a * w_std - q * _U32(self.P)  # exact mod 2^32; true value < 2P
        return jnp.where(r >= _U32(self.P), r - _U32(self.P), r)

    def shoup_np(self, w_std: np.ndarray) -> np.ndarray:
        """Shoup precomputation floor(w·2^32/P) for standard-form w."""
        return (
            (w_std.astype(np.uint64) << np.uint64(32)) // np.uint64(self.P)
        ).astype(_U32)

    def square(self, a):
        return self.mul(a, a)

    def double(self, a):
        return self.add(a, a)

    def halve(self, a):
        """a/2: (a + P)/2 when odd (monty-31/src/utils.rs:91)."""
        odd = a & 1
        shifted = a >> 1
        return jnp.where(odd == 1, shifted + _U32((self.P + 1) // 2), shifted)

    def mul_small(self, a, k: int):
        """Multiply by a small non-negative python int via double-and-add."""
        k %= self.P
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
        """a^e for a static python-int exponent (square-and-multiply)."""
        e %= self.P - 1
        if e == 0:
            return jnp.full_like(a, _U32(self.R))
        acc = None
        for bit in bin(e)[2:]:
            acc = a if acc is None else self.square(acc)
            if bit == "1" and acc is not a:
                acc = self.mul(acc, a)
        return acc

    def inv(self, a):
        """Elementwise inverse via Fermat (a^(P-2)); 0 maps to 0."""
        return self.exp(a, self.P - 2)

    def batch_inv(self, a):
        """Amortized elementwise inverse (`field/src/batch_inverse.rs:29`):
        two log-depth scans + ONE Fermat, ~6 muls/element. Zero -> zero."""
        from .batch_inv import batch_inv

        return batch_inv(self, a)

    def batch_inv_np(self, a: np.ndarray) -> np.ndarray:
        from .batch_inv import batch_inv_np

        return batch_inv_np(self, a)

    def try_sqrt_h(self, a: int):
        """Tonelli–Shanks sqrt (host): r with r²=a, or None (try_sqrt)."""
        from .batch_inv import try_sqrt_h

        return try_sqrt_h(self, a)

    def to_monty(self, x):
        """Device standard-form uint32 -> Monty form."""
        return self.mul(x, _U32(self.R2))

    def from_monty(self, x):
        """Device Monty form -> standard form uint32."""
        return self.mul(x, _U32(1))

    def sum(self, x, axis=0):
        """Tree-reduction sum with modular adds (log-depth, static slices)."""
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

    # ------------------------------------------------------------------
    # vectorized HOST (numpy) field ops on Monty-form uint32 arrays —
    # exact uint64 arithmetic, zero device compiles. Used for the small
    # tails of the prover (late FRI rounds, small trees) where an XLA
    # compile costs more than the whole computation.
    # ------------------------------------------------------------------
    def add_np(self, a, b):
        s = a.astype(np.uint32) + b
        return np.where(s >= _U32(self.P), s - _U32(self.P), s)

    def sub_np(self, a, b):
        d = a.astype(np.uint32) - b
        return np.where(a < b, d + _U32(self.P), d)

    def mul_np(self, a, b):
        """Monty product via uint64 — same subtractive REDC as `mul`
        (monty_reduce, utils.rs:103-126): t = lo32(a·b)·MU mod 2^32,
        r = hi32(a·b) − hi32(t·P), +P on borrow."""
        full = a.astype(np.uint64) * b.astype(np.uint64)
        hi = (full >> np.uint64(32)).astype(np.uint32)
        t = (full * np.uint64(self.MU)) & np.uint64(0xFFFFFFFF)
        u_hi = ((t * np.uint64(self.P)) >> np.uint64(32)).astype(np.uint32)
        r = hi - u_hi
        return np.where(hi < u_hi, r + _U32(self.P), r)

    def square_np(self, a):
        return self.mul_np(a, a)

    def double_np(self, a):
        return self.add_np(a, a)

    def halve_np(self, a):
        shifted = a >> 1
        return np.where(
            (a & 1) == 1, shifted + _U32((self.P + 1) // 2), shifted
        )

    def sum_np(self, x, axis=0):
        return (
            x.astype(np.uint64).sum(axis=axis) % np.uint64(self.P)
        ).astype(np.uint32)

    # ------------------------------------------------------------------
    # powers / twiddles (host precompute, exact)
    # ------------------------------------------------------------------
    def powers_np(self, base_std: int, count: int, monty: bool = True) -> np.ndarray:
        """[1, g, g^2, ...] as uint32 (Monty form by default). Host exact."""
        out = np.empty(count, dtype=_U32)
        acc = 1
        for i in range(count):
            out[i] = self.to_monty_h(acc) if monty else acc
            acc = (acc * base_std) % self.P
        return out

    def rand_np(self, rng: np.random.Generator, shape, monty: bool = True):
        """Uniform field elements (host), as uint32 in Monty/standard form."""
        x = rng.integers(0, self.P, size=shape, dtype=np.uint64)
        if monty:
            return ((x << np.uint64(32)) % np.uint64(self.P)).astype(_U32)
        return x.astype(_U32)
