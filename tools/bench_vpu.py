"""Measure raw VPU u32 op costs + monty-mul variants at LDE-like shape."""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, n=5):
    def sync(v):
        np.asarray(jnp.ravel(v)[:1])

    sync(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


from plonky3_tpu.fields.params import KoalaBear as F

N = 1 << 24  # 16M elements (64 MB)
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, F.P, (N,), dtype=np.uint32)).reshape(-1, 128)
b = jnp.asarray(rng.integers(0, F.P, (N,), dtype=np.uint32)).reshape(-1, 128)


@jax.jit
def k_add(a, b):
    x = a
    for _ in range(16):
        x = x + b
    return x


@jax.jit
def k_mul(a, b):
    x = a
    for _ in range(16):
        x = x * b
    return x


@jax.jit
def k_monty(a, b):
    x = a
    for _ in range(16):
        x = F.mul(x, b)
    return x


def monty_kb(x, y):
    """KoalaBear-specialized monty mul: MU = 2^31+2^24+1, P = 2^31-2^24+1.
    t = lo*MU and u_hi = hi(t*P) via shifts instead of limb muls."""
    from plonky3_tpu.fields.monty31 import _mul_hi_lo

    hi, lo = _mul_hi_lo(x, y)
    t = (lo << 31) + (lo << 24) + lo  # lo*MU mod 2^32
    # t*P = (t<<31) - (t<<24) + t as 64-bit; hi 32 bits with borrow/carry:
    lo_a = t << 31
    lo_b = t << 24
    l1 = lo_a - lo_b
    borrow1 = (lo_a < lo_b).astype(jnp.uint32)
    l2 = l1 + t
    carry2 = (l2 < l1).astype(jnp.uint32)
    u_hi = (t >> 1) - (t >> 8) - borrow1 + carry2
    r = hi - u_hi
    return jnp.where(hi < u_hi, r + jnp.uint32(F.P), r)


@jax.jit
def k_monty_kb(a, b):
    x = a
    for _ in range(16):
        x = monty_kb(x, b)
    return x


# verify correctness of monty_kb
ah = np.asarray(a[:10]).astype(np.uint64)
bh = np.asarray(b[:10]).astype(np.uint64)
want = np.asarray(F.mul(a[:10], b[:10]))
got = np.asarray(monty_kb(a[:10], b[:10]))
assert (want % F.P == got % F.P).all(), (want, got)
print("monty_kb correct")

t = timeit(lambda: k_add(a, b))
print(f"16x add   : {t * 1e3:7.2f} ms  ({16 * N / t / 1e9:6.1f} Gops/s)")
t = timeit(lambda: k_mul(a, b))
print(f"16x mul32 : {t * 1e3:7.2f} ms  ({16 * N / t / 1e9:6.1f} Gops/s)")
t = timeit(lambda: k_monty(a, b))
print(f"16x monty : {t * 1e3:7.2f} ms  ({16 * N / t / 1e9:6.1f} Gmul/s)")
t = timeit(lambda: k_monty_kb(a, b))
print(f"16x montKB: {t * 1e3:7.2f} ms  ({16 * N / t / 1e9:6.1f} Gmul/s)")
