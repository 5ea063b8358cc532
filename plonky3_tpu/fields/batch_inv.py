"""Batched field inversion — the Montgomery product trick, TPU-shaped.

The reference amortizes inversion cost across a slice
(`field/src/batch_inverse.rs:29`): one real inverse plus ~3 multiplies per
element, via sequential prefix products. On TPU the sequential walk becomes
two log-depth `lax.associative_scan`s (modular-mul combiner) plus a single
Fermat inverse of the total product:

    inv(a_i) = prefix(a_0..a_{i-1}) · suffix(a_{i+1}..) · total^-1

Total work ≈ 6 field muls / element vs ~60 for per-element Fermat
(31 squarings + ~20 muls for a 31-bit prime). Zeros map to zero, matching
the repo-wide `inv` convention (the reference panics; we mirror jnp style).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def batch_inv(F, a):
    """Elementwise inverse of a device array of any shape. Zero -> zero."""
    shape = a.shape
    flat = a.reshape(-1)
    if flat.shape[0] <= 2:
        return F.inv(a)
    one = F.const(1)
    zero_mask = flat == 0
    safe = jnp.where(zero_mask, one, flat)

    pref = jax.lax.associative_scan(F.mul, safe)  # inclusive prefix products
    suf = jax.lax.associative_scan(F.mul, safe, reverse=True)
    total_inv = F.inv(pref[-1])  # ONE Fermat inverse

    # inv_i = prefix_{i-1} · suffix_{i+1} · total_inv
    pref_excl = jnp.concatenate([jnp.full((1,), one, flat.dtype), pref[:-1]])
    suf_excl = jnp.concatenate([suf[1:], jnp.full((1,), one, flat.dtype)])
    out = F.mul(F.mul(pref_excl, suf_excl), total_inv)
    out = jnp.where(zero_mask, jnp.zeros_like(out), out)
    return out.reshape(shape)


def batch_inv_np(F, a: np.ndarray) -> np.ndarray:
    """Host (numpy) sequential Montgomery trick — exact reference shape
    (`batch_inverse.rs:29`): forward prefix products, one modular inverse,
    backward substitution. Standard-or-Monty agnostic (uses F.mul_np)."""
    shape = a.shape
    flat = np.ascontiguousarray(a).reshape(-1)
    n = flat.shape[0]
    if n == 0:
        return a.copy()
    one = np.uint32(F.to_monty_h(1)) if hasattr(F, "to_monty_h") else np.uint32(1)
    zero_mask = flat == 0
    safe = np.where(zero_mask, one, flat)

    safe = safe.reshape(n, 1)  # 1-elt rows: keep numpy in array (not scalar) mode
    pref = np.empty((n, 1), dtype=flat.dtype)
    acc = np.array([one], dtype=flat.dtype)
    for i in range(n):
        acc = F.mul_np(acc, safe[i])
        pref[i] = acc
    # total product inverse via host exact math
    if hasattr(F, "from_monty_h"):
        tot_std = F.from_monty_h(int(pref[-1, 0]))
        inv_std = F.inv_h(tot_std)
        acc = np.array([F.to_monty_h(inv_std)], dtype=flat.dtype)
    else:
        acc = np.array([F.inv_h(int(pref[-1, 0]))], dtype=flat.dtype)
    out = np.empty(n, dtype=flat.dtype)
    for i in range(n - 1, 0, -1):
        out[i] = F.mul_np(acc, pref[i - 1])[0]
        acc = F.mul_np(acc, safe[i])
    out[0] = acc[0]
    out = np.where(zero_mask, np.zeros_like(out), out)
    return out.reshape(shape)


def try_sqrt_h(F, a: int):
    """Tonelli–Shanks square root (host ints, standard form) — the
    reference's `Field::try_sqrt` (`field/src/field.rs` halve/sqrt family).
    Returns a root r with r² = a mod P, or None if a is a non-residue."""
    p = F.P
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    # write p-1 = q · 2^s
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    if s == 1:
        return pow(a, (p + 1) // 4, p)
    # find a non-residue z
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = (t2 * t2) % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, (b * b) % p
        t = (t * c) % p
        r = (r * b) % p
    return r
