#!/usr/bin/env python
"""Cumulative-stage profile of the split device-FS prover.

Compiles the REAL `_device_body_p1` / `_device_body_p2` truncated at
each phase boundary (the `stop` probe parameter) at the headline bench
shape and times warm runs at a pull boundary, attributing wall time to
phases by cumulative differences. This is the only trustworthy
attribution on this setup: `block_until_ready` does not truly sync
through the axon tunnel, so piecewise per-kernel timings (docs/PERF.md)
under-report anything that only shows up in the fused programs (it was
this tool that isolated the 294 ms sequential ys-observe keccak chain
the split removed — see stark/fast_prover.py's module docstring).

Env: PROF_LOG_N (default 17), PROF_MERKLE (keccak-f | poseidon2).
Prints one JSON line per stage plus the end-to-end prove_fast spans.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P1_STAGES = ["trace_commit", "quotient_vals", "quotient_commit", "ys", None]
P2_STAGES = ["accum", "fri", "grind", None]


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
    from plonky3_tpu.stark.fast_prover import (
        _device_body_p1,
        _device_body_p2,
        prove_fast,
    )
    from plonky3_tpu.stark.verifier import verify

    log_n = int(os.environ.get("PROF_LOG_N", "17"))
    merkle = os.environ.get("PROF_MERKLE", "keccak-f")
    mk = keccak_stark_config if merkle == "keccak-f" else poseidon2_stark_config
    config = mk(F, E, FriParameters.new_benchmark_high_arity())

    air = Poseidon2VectorAir(F, 16, vector_len=8)
    n_perms = 8 << log_n
    rng = np.random.default_rng(1)
    inputs = jnp.asarray(F.rand_np(rng, (n_perms, 16)))
    trace, _ = generate_vectorized_trace(air, inputs)
    trace.block_until_ready()
    publics_m = jnp.zeros((0,), jnp.uint32)

    def timed(fn, *args):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    prev = 0.0
    meta = {}
    for stop in P1_STAGES:
        m = {}
        fn = jax.jit(
            lambda tr, pm, _s=stop, _m=m: _device_body_p1(
                config, air, tr, pm, _m, stop=_s
            )
        )
        t, out = timed(fn, trace, publics_m)
        print(json.dumps({
            "stage": f"p1:{stop or 'full'}",
            "cumulative_s": round(t, 4), "delta_s": round(t - prev, 4),
        }), flush=True)
        prev = t
        if stop is None:
            meta = m
            small, carry = out

    # host replay -> alpha2 + seed (mirrors _prove_device_fs)
    small_np = np.asarray(small)
    pulled, off = [], 0
    for shape in meta["shapes_p1"]:
        cnt = int(np.prod(shape, dtype=np.int64))
        pulled.append(small_np[off:off + cnt].reshape(shape))
        off += cnt
    it = iter(pulled)
    next(it)  # flags
    dif = meta["digest_is_field"]

    def dconv(a):
        a = F.from_monty_np(a) if dif else a
        if a.ndim == 1:
            return tuple(int(x) for x in a)
        return tuple(tuple(int(x) for x in row) for row in a)

    trace_root = dconv(next(it))
    quotient_root = dconv(next(it))
    ys_np = [F.from_monty_np(next(it)) for _ in range(meta["n_ys"])]
    if meta["host_alpha2"]:
        hch = config.initialise_challenger()
        hch.observe(meta["log_n"])
        hch.observe(meta["log_n"])
        hch.observe(0)
        hch.observe_digest(trace_root)
        hch.sample_ext(E.D)
        hch.observe_digest(quotient_root)
        hch.sample_ext(E.D)
        for y in ys_np:
            hch.observe_base_array(y)
        alpha2 = hch.sample_ext(E.D)
        alpha2_dev = jnp.asarray(
            F.to_monty_np(np.asarray(alpha2, dtype=np.uint32))
        )
        if config.challenger_kind == "keccak":
            seed = jnp.asarray(
                np.frombuffer(bytes(hch.input_buffer), dtype="<u4")
            )
        else:
            seed = jnp.asarray(F.to_monty_np(
                np.asarray(hch.state, dtype=np.uint64).astype(np.uint32)
            ))
    else:
        alpha2_dev, seed = carry[-1]

    prev = 0.0
    for stop in P2_STAGES:
        fn = jax.jit(
            lambda c, a2, s, _s=stop: _device_body_p2(
                config, air, c, a2, s, meta, stop=_s
            )
        )
        t, _ = timed(fn, carry, alpha2_dev, seed)
        print(json.dumps({
            "stage": f"p2:{stop or 'full'}",
            "cumulative_s": round(t, 4), "delta_s": round(t - prev, 4),
        }), flush=True)
        prev = t

    # end-to-end spans of the shipped path
    prove_fast(config, air, trace, [])  # warm
    spans = {}
    t0 = time.perf_counter()
    proof = prove_fast(config, air, trace, [], spans=spans)
    total = time.perf_counter() - t0
    verify(config, air, proof, [])
    print(json.dumps({
        "stage": "prove_fast", "total_s": round(total, 4),
        "perms_per_s": round(n_perms / total, 1),
        "spans": {k: round(v, 4) for k, v in spans.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
