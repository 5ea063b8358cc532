#!/usr/bin/env python
"""Multi-stark (zerocheck + WHIR) perf on the real chip — the round-3
VERDICT demanded a measured number for the multilinear stack at >= 2^16
rows (PERF.md entry).

Workload: Poseidon2VectorAir (width 164, one width-16 permutation per
row) over 2^MS_LOG_N rows, proven with the SuperSpartan-style
multi-stark (device zerocheck + device WHIR opening of the stacked
trace MLE — 2^(MS_LOG_N + 8) stacked variables).

Env: MS_LOG_N (default 16), MS_QUERIES (default 100).
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

    from plonky3_tpu.challenger.duplex import DuplexChallenger
    # BabyBear: the stacked MLE needs a 2^(log_n + 8 + blowup) two-adic
    # codeword domain — 2^25 at the default shape, over KoalaBear's
    # 2-adicity of 24 but under BabyBear's 27
    from plonky3_tpu.fields import BabyBearExt4 as E
    from plonky3_tpu.fields.params import BabyBear as F
    from plonky3_tpu.hashes.poseidon2 import default_poseidon2
    from plonky3_tpu.hashes.sponge import (
        PaddingFreeSponge,
        TruncatedPermutation,
    )
    from plonky3_tpu.merkle.extension_mmcs import ExtensionMmcs
    from plonky3_tpu.merkle.mmcs import MerkleTreeMmcs
    from plonky3_tpu.models.poseidon2_air import (
        Poseidon2VectorAir,
        generate_vectorized_trace,
    )
    from plonky3_tpu.multilinear.multi_stark import (
        prove_multi_stark,
        verify_multi_stark,
    )
    from plonky3_tpu.multilinear.whir import WhirConfig, WhirPcs

    log_n = int(os.environ.get("MS_LOG_N", "16"))
    queries = int(os.environ.get("MS_QUERIES", "100"))

    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
    )
    air = Poseidon2VectorAir(F, 16, vector_len=1)
    wp_log = max((air.width - 1).bit_length(), 0)
    n_stacked = log_n + wp_log
    cfg = WhirConfig(
        log_blowup=1, folding_factor=2,
        final_vars=n_stacked % 2 + 4,
        num_queries=queries, ood_samples=1, pow_bits=8,
    )
    pcs = WhirPcs(F=F, E=E, config=cfg, mmcs=mmcs,
                  fri_mmcs=ExtensionMmcs(inner=mmcs, D=E.D))

    rng = np.random.default_rng(1)
    inputs = jnp.asarray(F.rand_np(rng, (1 << log_n, 16)))
    trace_m, _ = generate_vectorized_trace(air, inputs)
    trace_std = F.from_monty_np(np.asarray(trace_m))

    def ch():
        return DuplexChallenger(default_poseidon2(F, 24), rate=16)

    proof = prove_multi_stark(pcs, air, trace_std, [], ch())  # warm-up
    t0 = time.perf_counter()
    proof = prove_multi_stark(pcs, air, trace_std, [], ch())
    dt = time.perf_counter() - t0
    verify_multi_stark(pcs, air, proof, [], ch())

    print(json.dumps({
        "metric": f"multi_stark_2^{log_n}x{air.width}_poseidon2_whir",
        "value": round(dt, 3),
        "unit": "s",
        "rows_per_s": round((1 << log_n) / dt, 1),
        "stacked_vars": n_stacked,
    }))


if __name__ == "__main__":
    main()
