"""Microbench: trace coset LDE at the headline-bench shape (2^17x1312 -> 2^18)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plonky3_tpu.fields.params import KoalaBear as F
from plonky3_tpu.ops.ntt import coset_lde_batch, _dif

log_n = 17
w = 1312
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, F.P, size=(1 << log_n, w), dtype=np.uint32))
x.block_until_ready()

shift = F.mul_h(F.GENERATOR, 1)

def timeit(fn, n=5, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]

# full LDE
mn, md = timeit(lambda: coset_lde_batch(F, x, 1, shift, with_coeffs=True))
print(f"coset_lde_batch 2^17x{w} blowup2: min {mn*1e3:.1f} ms  med {md*1e3:.1f} ms")

# forward DIF at 2^18 (the big half)
x2 = jnp.concatenate([x, jnp.zeros_like(x)], axis=0)
fwd = jax.jit(lambda a: _dif(F, a, 18, False))
mn, md = timeit(lambda: fwd(x2))
print(f"dif fwd 2^18x{w}: min {mn*1e3:.1f} ms  med {md*1e3:.1f} ms")

# inverse DIF at 2^17
inv = jax.jit(lambda a: _dif(F, a, 17, True))
mn, md = timeit(lambda: inv(x))
print(f"dif inv 2^17x{w}: min {mn*1e3:.1f} ms  med {md*1e3:.1f} ms")
