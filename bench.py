"""Headline benchmark — prints ONE JSON line for the driver.

Canonical metric (BASELINE.md): prove 2^20 Poseidon2-width-16 permutations
(KoalaBear, 8 perms/row x 2^17 rows) with production FRI parameters
(log_blowup=1, 100 queries, 16-bit query PoW, arity up to 2^3 — 116-bit
conjectured soundness) and the keccak-f Merkle hash, on the real chip.

Two proves run in-process: run 0 pays one-time XLA compiles; run 1 is the
steady-state number reported (the reference's criterion benches likewise
measure warm runs). The proof from run 1 is verified before reporting.
`vs_baseline` is null — the reference publishes no absolute numbers
(BASELINE.md "Published numbers").

Env knobs: BENCH_LOG_N (default 17), BENCH_MERKLE (keccak-f | poseidon2),
BENCH_PROVER (fast | host — default fast, the single-dispatch device-FS
prover, measured 1.47M perms/s vs host's 1.0M on 2026-08-18; `host`
selects the round-2 host-transcript path).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


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
    from plonky3_tpu.stark.verifier import verify

    if os.environ.get("BENCH_PROVER", "fast") == "host":
        from plonky3_tpu.stark.prover import prove
    else:
        from plonky3_tpu.stark.fast_prover import prove_fast as prove

    log_n = int(os.environ.get("BENCH_LOG_N", "17"))
    merkle = os.environ.get("BENCH_MERKLE", "keccak-f")
    mk = keccak_stark_config if merkle == "keccak-f" else poseidon2_stark_config
    config = mk(F, E, FriParameters.new_benchmark_high_arity())

    air = Poseidon2VectorAir(F, 16, vector_len=8)
    n_perms = 8 << log_n
    rng = np.random.default_rng(1)
    inputs = jnp.asarray(F.rand_np(rng, (n_perms, 16)))
    trace, _ = generate_vectorized_trace(air, inputs)
    trace.block_until_ready()

    prove(config, air, trace, [])  # warm-up: one-time compiles
    t0 = time.perf_counter()
    proof = prove(config, air, trace, [])
    dt = time.perf_counter() - t0
    verify(config, air, proof, [])

    print(json.dumps({
        "metric": f"prove_2^{log_n + 3}_poseidon2_perms_{merkle}_koalabear",
        "value": round(n_perms / dt, 1),
        "unit": "perms/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
