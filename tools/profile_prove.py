"""Phase-level profile of the headline bench workload.

Prints the spans dict collected by prove() (sync-attributed wall-clock
per phase) for the steady-state run, plus total time. Knobs:
PROF_LOG_N (default 17), PROF_MERKLE (keccak-f | poseidon2),
PROF_RUNS (default 2 — first run pays compiles).
"""

from __future__ import annotations

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
    from plonky3_tpu.stark.prover import prove

    log_n = int(os.environ.get("PROF_LOG_N", "17"))
    merkle = os.environ.get("PROF_MERKLE", "keccak-f")
    runs = int(os.environ.get("PROF_RUNS", "2"))
    mk = keccak_stark_config if merkle == "keccak-f" else poseidon2_stark_config
    config = mk(F, E, FriParameters.new_benchmark_high_arity())

    air = Poseidon2VectorAir(F, 16, vector_len=8)
    n_perms = 8 << log_n
    rng = np.random.default_rng(1)
    inputs = jnp.asarray(F.rand_np(rng, (n_perms, 16)))
    trace, _ = generate_vectorized_trace(air, inputs)
    trace.block_until_ready()

    for r in range(runs):
        spans = {}
        t0 = time.perf_counter()
        prove(config, air, trace, [], spans=spans)
        dt = time.perf_counter() - t0
        print(f"--- run {r}: total {dt * 1e3:.1f} ms "
              f"({n_perms / dt:,.0f} perms/s)")
        for k, v in spans.items():
            print(f"  {k:38s} {v * 1e3:8.1f} ms")
        other = dt - sum(spans.values())
        print(f"  {'(unattributed)':38s} {other * 1e3:8.1f} ms")
    print(json.dumps({"total_s": dt, "perms_s": n_perms / dt}))


if __name__ == "__main__":
    main()
