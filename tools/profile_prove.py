"""Spans-profiled headline prove on the real chip (prints the phase table)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from plonky3_tpu.fields import KoalaBearExt4 as E
from plonky3_tpu.fields.params import KoalaBear as F
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.models.poseidon2_air import (
    Poseidon2VectorAir,
    generate_vectorized_trace,
)
from plonky3_tpu.stark.config import keccak_stark_config
from plonky3_tpu.stark.prover import prove
from plonky3_tpu.stark.verifier import verify

log_n = int(os.environ.get("BENCH_LOG_N", "17"))
config = keccak_stark_config(F, E, FriParameters.new_benchmark_high_arity())
air = Poseidon2VectorAir(F, 16, vector_len=8)
n_perms = 8 << log_n
rng = np.random.default_rng(1)
inputs = jnp.asarray(F.rand_np(rng, (n_perms, 16)))
trace, _ = generate_vectorized_trace(air, inputs)
trace.block_until_ready()

prove(config, air, trace, [])  # warm-up
reps = int(os.environ.get("REPS", "2"))
best = None
for _ in range(reps):
    spans = {}
    t0 = time.perf_counter()
    proof = prove(config, air, trace, [], spans=spans)
    dt = time.perf_counter() - t0
    if best is None or dt < best[0]:
        best = (dt, spans, proof)
dt, spans, proof = best
print(f"total: {dt*1e3:.1f} ms  ({n_perms/dt:,.0f} perms/s)")
for k, v in spans.items():
    print(f"  {k:40s} {v*1e3:8.1f} ms")
verify(config, air, proof, [])
print("verified OK")
