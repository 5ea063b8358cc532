"""Micro-benchmarks of the prover's hot device kernels at bench shape.

Times (median of 5 after warm-up) for: K1/K2 pallas NTT kernels, full
dif_fused, coset_lde_batch, keccak merkle leaf+tree, quotient eval.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=5):
    import jax.numpy as jnp

    def sync(v):
        # block_until_ready is not a reliable sync through the axon
        # tunnel; force a 1-element device->host pull instead.
        leaf = v
        while isinstance(leaf, (list, tuple)):
            leaf = leaf[0]
        np.asarray(jnp.ravel(leaf)[:1])

    sync(fn())  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from plonky3_tpu.fields.params import KoalaBear as F
    from plonky3_tpu.ops.ntt import coset_lde_batch
    from plonky3_tpu.ops.ntt_pallas import dif_fused

    w = int(os.environ.get("K_W", "1312"))
    log_n = int(os.environ.get("K_LOGN", "17"))
    n = 1 << log_n
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, F.P, (n, w), dtype=np.uint32))
    x2 = jnp.asarray(rng.integers(0, F.P, (2 * n, w), dtype=np.uint32))

    t = timeit(lambda: dif_fused(F, x, log_n, False))
    print(f"dif_fused fwd {log_n} x {w}: {t * 1e3:8.2f} ms")
    t = timeit(lambda: dif_fused(F, x, log_n, True))
    print(f"dif_fused inv {log_n} x {w}: {t * 1e3:8.2f} ms")
    t = timeit(lambda: dif_fused(F, x2, log_n + 1, False))
    print(f"dif_fused fwd {log_n + 1} x {w}: {t * 1e3:8.2f} ms")
    t = timeit(lambda: dif_fused(F, x, log_n + 1, False, zero_top=True))
    print(f"dif_fused fwd zt {log_n + 1} x {w}: {t * 1e3:8.2f} ms")
    t = timeit(lambda: coset_lde_batch(F, x, 1, F.GENERATOR,
                                       with_coeffs=True)[0])
    print(f"coset_lde_batch {log_n}+1 x {w}: {t * 1e3:8.2f} ms")

    # merkle keccak leaf + tree at 2^18
    from plonky3_tpu.stark.config import keccak_stark_config
    from plonky3_tpu.fields import KoalaBearExt4 as E
    from plonky3_tpu.fri.config import FriParameters

    config = keccak_stark_config(F, E, FriParameters.new_benchmark_high_arity())
    mmcs = config.pcs.mmcs
    lde = jnp.asarray(rng.integers(0, F.P, (2 * n, w), dtype=np.uint32))
    t = timeit(lambda: mmcs.commit([lde]).layers[-1], n=3)
    print(f"merkle commit {log_n + 1} x {w}: {t * 1e3:8.2f} ms")
    t = timeit(lambda: mmcs.sponge.hash_rows_device([lde]), n=3)
    print(f"merkle leaf sponge only: {t * 1e3:8.2f} ms")

    # quotient eval at bench shape
    from plonky3_tpu.models.poseidon2_air import (
        Poseidon2VectorAir, generate_vectorized_trace,
    )
    from plonky3_tpu.stark.prover import quotient_values
    from plonky3_tpu.air.api import (
        get_log_num_quotient_chunks, get_symbolic_layout,
    )

    air = Poseidon2VectorAir(F, 16, vector_len=8)
    pcs = config.pcs
    dom = pcs.natural_domain_for_degree(n)
    qd = dom.create_disjoint_domain(
        1 << (log_n + get_log_num_quotient_chunks(air))
    )
    t_on_qd = jnp.asarray(rng.integers(0, F.P, (qd.size, w), dtype=np.uint32))
    n_cons, _ = get_symbolic_layout(air)
    alpha_pows = jnp.asarray(
        E.powers_np(tuple(int(v) for v in rng.integers(1, F.P, 4)), n_cons)[
            ::-1
        ].copy()
    )
    pubs = jnp.zeros((0,), jnp.uint32)
    t = timeit(
        lambda: quotient_values(config, air, dom, qd, t_on_qd, pubs,
                                alpha_pows),
        n=3,
    )
    print(f"quotient eval {qd.size} rows: {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
