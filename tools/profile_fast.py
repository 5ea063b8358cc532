#!/usr/bin/env python
"""Span profile of the SHIPPED bench path (`prove_fast`) at the headline
shape: dispatch / single-pull / host-assembly buckets, steady state.

(The fused program makes finer on-device attribution impossible without
a device profiler; the pull bucket = device execution + transfer. See
docs/PERF.md for the per-kernel device budget measured piecewise.)

Env: PROF_LOG_N (default 17), PROF_MERKLE (keccak-f | poseidon2),
PROF_RUNS (default 3; run 0 pays compiles).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

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
    from plonky3_tpu.stark.config import (
        keccak_stark_config,
        poseidon2_stark_config,
    )
    from plonky3_tpu.stark.fast_prover import prove_fast

    log_n = int(os.environ.get("PROF_LOG_N", "17"))
    merkle = os.environ.get("PROF_MERKLE", "keccak-f")
    runs = int(os.environ.get("PROF_RUNS", "3"))
    mk = keccak_stark_config if merkle == "keccak-f" else poseidon2_stark_config
    config = mk(F, E, FriParameters.new_benchmark_high_arity())

    air = Poseidon2VectorAir(F, 16, vector_len=8)
    rng = np.random.default_rng(1)
    inputs = jnp.asarray(F.rand_np(rng, (8 << log_n, 16)))
    trace, _ = generate_vectorized_trace(air, inputs)
    trace.block_until_ready()

    for r in range(runs):
        spans = {}
        t0 = time.perf_counter()
        prove_fast(config, air, trace, [], spans=spans)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "run": r, "total_s": round(dt, 4),
            "spans": {k: round(v, 4) for k, v in spans.items()},
        }))


if __name__ == "__main__":
    main()
