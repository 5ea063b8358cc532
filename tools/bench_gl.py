#!/usr/bin/env python
"""Goldilocks LDE + Merkle-commit perf on the real chip (PERF.md entry).

Measures the two hot phases of a GL commit at a production-ish shape:
coset LDE (blowup 2) of a (2^LOG_N, W) GL matrix and the Poseidon2-GL
Merkle tree over the LDE — the GL analogs of the KoalaBear headline
path's phases. Env: GL_LOG_N (default 15), GL_WIDTH (default 8).
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

    from plonky3_tpu.fields.goldilocks import Goldilocks as G
    from plonky3_tpu.gl.field import repair, split_host
    from plonky3_tpu.gl.merkle import gl_merkle_mmcs
    from plonky3_tpu.gl.ntt import gl_coset_lde_batch

    log_n = int(os.environ.get("GL_LOG_N", "15"))
    w = int(os.environ.get("GL_WIDTH", "8"))
    n = 1 << log_n
    rng = np.random.default_rng(1)
    mat = G.rand_np(rng, (n, w))
    wire = jnp.asarray(split_host(mat))
    mmcs = gl_merkle_mmcs()

    def run():
        lde = gl_coset_lde_batch(
            (wire[..., 0::2], wire[..., 1::2]), 1, G.GENERATOR
        )
        lde_wire = repair(*lde)
        data = mmcs.commit([lde_wire])
        jax.block_until_ready(data.layers[-1])
        return data

    run()  # compile
    t0 = time.perf_counter()
    lde = gl_coset_lde_batch(
        (wire[..., 0::2], wire[..., 1::2]), 1, G.GENERATOR
    )
    jax.block_until_ready(lde)
    t_lde = time.perf_counter() - t0
    lde_wire = repair(*lde)
    t0 = time.perf_counter()
    data = mmcs.commit([lde_wire])
    jax.block_until_ready(data.layers[-1])
    t_commit = time.perf_counter() - t0

    out = {
        "metric": f"gl_lde_commit_2^{log_n}x{w}",
        "lde_s": round(t_lde, 4),
        "commit_s": round(t_commit, 4),
        "lde_melem_per_s": round(2 * n * w / t_lde / 1e6, 1),
        "commit_mhash_per_s": round(2 * n / t_commit / 1e6, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
