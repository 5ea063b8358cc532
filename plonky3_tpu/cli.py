"""Benchmark / demo CLI — the `examples/examples/prove_prime_field_31.rs`
analog (:51-73 flag matrix). Usage:

    python -m plonky3_tpu.cli prove --field koala-bear \
        --objective poseidon-2-permutations --log-trace-length 17 \
        --fri benchmark-high-arity

Prints per-phase wall-clock (the reference's tracing-forest span tree,
SURVEY.md §5 tracing), proof size, and the conjectured soundness bits.
"""

from __future__ import annotations

import argparse
import time


def _field(name):
    from .fields import (
        BabyBear,
        BabyBearExt4,
        KoalaBear,
        KoalaBearExt4,
    )

    return {
        "koala-bear": (KoalaBear, KoalaBearExt4),
        "baby-bear": (BabyBear, BabyBearExt4),
    }[name]


def _fri_params(name):
    from .fri.config import FriParameters

    return {
        "testing": FriParameters.new_testing(),
        "benchmark": FriParameters.new_benchmark(),
        "benchmark-high-arity": FriParameters.new_benchmark_high_arity(),
    }[name]


class _Spans:
    """Minimal span-tree timer (tracing-forest analog)."""

    def __init__(self):
        self.rows = []

    def span(self, name):
        import contextlib

        @contextlib.contextmanager
        def cm():
            t0 = time.perf_counter()
            yield
            self.rows.append((name, time.perf_counter() - t0))

        return cm()

    def report(self):
        total = sum(t for n, t in self.rows if not n.startswith("  "))
        for name, t in self.rows:
            print(f"  {name:<28s} {t*1e3:10.1f} ms")
        print(f"  {'TOTAL':<28s} {total*1e3:10.1f} ms")
        return total


def cmd_prove(args):
    import jax

    # persistent compile cache: repeat runs (and the driver bench) skip the
    # multi-minute XLA compiles of the fused phase programs
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from .models.fibonacci import FibonacciAir, generate_fibonacci_trace
    from .models.poseidon2_air import (
        Poseidon2VectorAir,
        generate_vectorized_trace,
    )
    from .stark.config import keccak_stark_config, poseidon2_stark_config
    from .stark.verifier import verify

    if args.prover == "fast":
        # the two-dispatch device-Fiat-Shamir prover (the bench.py path;
        # falls back to the host transcript when the config is out of
        # its scope, e.g. ZK or query_pow_bits == 0)
        from .stark.fast_prover import prove_fast as prove
    else:
        from .stark.prover import prove

    if args.field == "mersenne-31":
        from .fields.mersenne31 import Mersenne31
        from .stark.config import circle_stark_config

        F = Mersenne31
        fp = _fri_params(args.fri)
        assert fp.max_log_arity == 1, "circle FRI: use --fri testing/benchmark"
        config = circle_stark_config(fp)
    else:
        F, E = _field(args.field)
        mk_config = {
            "poseidon2": poseidon2_stark_config,
            "keccak-f": keccak_stark_config,
        }[args.merkle_hash]
        config = mk_config(F, E, _fri_params(args.fri))
    spans = _Spans()
    log_n = args.log_trace_length

    if args.objective == "poseidon-2-permutations":
        vector_len = 1 << args.log_vector_len
        air = Poseidon2VectorAir(F, 16, vector_len=vector_len)
        rng = np.random.default_rng(1)
        n_perms = vector_len << log_n
        inputs = jnp.asarray(F.rand_np(rng, (n_perms, 16)))
        with spans.span("generate trace (device)"):
            trace, _ = generate_vectorized_trace(air, inputs)
            trace.block_until_ready()
        publics = []
        print(
            f"objective: {n_perms} Poseidon2-16 permutations "
            f"({vector_len}/row x 2^{log_n} rows, width {air.width})"
        )
    elif args.objective == "keccak-f-permutations":
        from .models.keccak_air import KeccakAir, generate_keccak_trace

        air = KeccakAir(F)
        rng = np.random.default_rng(1)
        n_perms = max((1 << log_n) // 24, 1)
        inputs = rng.integers(0, 1 << 64, size=(n_perms, 25),
                              dtype=np.uint64)
        with spans.span("generate trace (host)"):
            rows = generate_keccak_trace(F, inputs)
            trace = jnp.asarray(F.to_monty_np(rows))
        publics = []
        print(
            f"objective: {n_perms} keccak-f[1600] permutations "
            f"(24 rows each, width {air.width})"
        )
    elif args.objective == "blake3-permutations":
        from .models.blake3_air import Blake3Air, generate_blake3_trace

        air = Blake3Air(F)
        rng = np.random.default_rng(1)
        n_perms = 1 << log_n
        inputs = rng.integers(0, 1 << 32, size=(n_perms, 24),
                              dtype=np.uint64).astype(np.uint32)
        with spans.span("generate trace (host)"):
            rows = generate_blake3_trace(F, inputs)
            trace = jnp.asarray(F.to_monty_np(rows))
        publics = []
        print(
            f"objective: {n_perms} blake3 compressions "
            f"(1 row each, width {air.width})"
        )
    elif args.objective == "fibonacci":
        air = FibonacciAir(F)
        with spans.span("generate trace (host)"):
            rows, publics = generate_fibonacci_trace(F, log_n)
            trace = jnp.asarray(F.to_monty_np(rows))
    else:
        raise SystemExit(f"unknown objective {args.objective}")

    for rep in range(args.repeat):
        phase = {}
        with spans.span(f"prove (total, run {rep})"):
            proof = prove(config, air, trace, publics, spans=phase)
        spans.rows.extend((f"  prove: {k}", v) for k, v in phase.items())

    with spans.span("verify (host)"):
        verify(config, air, proof, publics)

    total = spans.report()
    size = proof.size_in_bytes() if hasattr(proof, "size_in_bytes") else None
    if size is not None:
        print(f"  proof size: {size} bytes")
    fp = config.pcs.fri
    from .stark.security import (
        FriRegime,
        InstanceShape,
        StarkAirParams,
        conjectured_security,
        proven_security,
    )
    from .air.api import get_symbolic_layout

    n_cons, max_deg = get_symbolic_layout(air)
    regime = FriRegime(
        log_blowup=fp.log_blowup,
        num_queries=fp.num_queries,
        log_final_poly_len=fp.log_final_poly_len,
        max_log_arity=fp.max_log_arity,
        commit_pow_bits=fp.commit_proof_of_work_bits,
        query_pow_bits=fp.query_proof_of_work_bits,
    )
    shape = InstanceShape(
        log_trace_length=log_n,
        modulus_bits=31.0 * config.E.D,
        collision_resistance=128.0,
    )
    air_params = StarkAirParams(
        num_constraints=n_cons, max_constraint_degree=max_deg, max_combo=2
    )
    print(
        f"  soundness: {conjectured_security(regime, shape):.1f} bits "
        f"conjectured, {proven_security(regime, air_params, shape):.1f} "
        f"proven"
    )
    return total


def cmd_pcs_comparison(args):
    """FRI vs STIR univariate PCS: same matrix, same opening point —
    commit/open/verify wall-clock + proof bytes (the
    `examples/examples/pcs_comparison.rs` analog)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from .challenger.duplex import DuplexChallenger
    from .fri.config import FriParameters
    from .fri.two_adic_pcs import TwoAdicFriPcs
    from .hashes.poseidon2 import default_poseidon2
    from .hashes.sponge import PaddingFreeSponge, TruncatedPermutation
    from .merkle.extension_mmcs import ExtensionMmcs
    from .merkle.mmcs import MerkleTreeMmcs
    from .stir import StirParameters
    from .stir.pcs import TwoAdicStirPcs

    F, E = _field(args.field)
    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
    )
    ext_mmcs = ExtensionMmcs(inner=mmcs, D=E.D)
    fri_pcs = TwoAdicFriPcs(
        F=F, E=E, fri=_fri_params(args.fri), mmcs=mmcs,
        fri_mmcs=ext_mmcs,
    )
    stir_pcs = TwoAdicStirPcs(
        F=F, E=E,
        params=StirParameters(
            log_blowup=args.log_blowup,
            log_folding_factor=args.log_folding_factor,
            security_level=args.security_level,
            max_pow_bits=args.max_pow_bits,
        ),
        mmcs=mmcs, stir_mmcs=ext_mmcs,
    )

    rng = np.random.default_rng(3)
    n, w = 1 << args.log_trace_length, args.width
    evals = jnp.asarray(F.rand_np(rng, (n, w)))
    z = E.rand_h(rng)

    def run(name, pcs):
        domain = pcs.natural_domain_for_degree(n)
        ch = DuplexChallenger(default_poseidon2(F, 24), rate=16)
        t0 = time.perf_counter()
        data = pcs.commit([(domain, evals)])
        ch.observe_many(data.root_std)
        opened, proof = pcs.open([(data, [[z]])], ch)
        t_prove = time.perf_counter() - t0
        vch = DuplexChallenger(default_poseidon2(F, 24), rate=16)
        vch.observe_many(data.root_std)
        t0 = time.perf_counter()
        pcs.verify(
            [(data.root_std, [(domain, [(z, opened[0][0][0])])])],
            proof, vch,
        )
        t_verify = time.perf_counter() - t0
        size = _proof_bytes(E, proof)
        print(
            f"  {name:<6s} commit+open {t_prove*1e3:9.1f} ms   "
            f"verify {t_verify*1e3:8.1f} ms   proof {size} bytes"
        )

    print(
        f"pcs comparison: 2^{args.log_trace_length} x {args.width} "
        f"{args.field} matrix, 1 opening point"
    )
    run("fri", fri_pcs)
    run("stir", stir_pcs)

    # WHIR (multilinear): same data as one stacked MLE; parameters are
    # derived from a SecurityAssumption (whir.rs:220), and the achieved
    # soundness report prints after verification (VERDICT r2 #6)
    from .multilinear.whir import WhirConfig, WhirPcs

    wp = 1 << max((w - 1).bit_length(), 0)
    n_vars = args.log_trace_length + max((w - 1).bit_length(), 0)
    wcfg = WhirConfig.from_security(
        args.security_level, "johnson", n_vars,
        field_bits=E.D * (F.P.bit_length()),
        log_blowup=args.log_blowup, folding_factor=2,
        max_pow_bits=args.max_pow_bits,
    )
    whir_pcs = WhirPcs(
        F=F, E=E, config=wcfg, mmcs=mmcs, fri_mmcs=ext_mmcs
    )
    stacked = np.zeros(n * wp, np.uint32)
    host_evals = F.from_monty_np(np.asarray(evals))
    for j in range(w):
        stacked[j * n : (j + 1) * n] = host_evals[:, j]
    point = [E.rand_h(rng) for _ in range(n_vars)]
    ch = DuplexChallenger(default_poseidon2(F, 24), rate=16)
    t0 = time.perf_counter()
    commit, data = whir_pcs.commit(stacked)
    ch.observe_digest(commit)
    value, wproof = whir_pcs.open(data, point, ch)
    t_prove = time.perf_counter() - t0
    vch = DuplexChallenger(default_poseidon2(F, 24), rate=16)
    vch.observe_digest(commit)
    t0 = time.perf_counter()
    whir_pcs.verify(commit, n_vars, point, value, wproof, vch)
    t_verify = time.perf_counter() - t0
    size = _proof_bytes(E, wproof)
    print(
        f"  {'whir':<6s} commit+open {t_prove*1e3:9.1f} ms   "
        f"verify {t_verify*1e3:8.1f} ms   proof {size} bytes"
    )
    rep = wcfg.soundness_report(n_vars, E.D * F.P.bit_length())
    print(
        f"         whir soundness (johnson, target "
        f"{args.security_level}b): {rep.get('conjectured_bits')} bits"
        f"  schedule queries={list(wcfg.round_queries)}"
        f" pow={list(wcfg.round_pow_bits)}"
    )


def _proof_bytes(E, proof):
    """Wire-size estimate: 4 bytes/base element over any proof tree."""

    def walk(x):
        if isinstance(x, (list, tuple)):
            return sum(walk(v) for v in x)
        if isinstance(x, dict):
            return sum(walk(v) for v in x.values())
        if hasattr(x, "__dict__"):
            return walk(vars(x))
        if isinstance(x, (int, np.integer)):
            return 4
        return 0

    import numpy as np

    return walk(proof)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="plonky3_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("prove")
    p.add_argument("--field", default="koala-bear",
                   choices=["koala-bear", "baby-bear", "mersenne-31"])
    p.add_argument("--objective", default="poseidon-2-permutations",
                   choices=["poseidon-2-permutations", "fibonacci",
                            "keccak-f-permutations",
                            "blake3-permutations"])
    p.add_argument("--log-trace-length", type=int, default=10)
    p.add_argument("--log-vector-len", type=int, default=3)
    p.add_argument("--fri", default="benchmark-high-arity",
                   choices=["testing", "benchmark", "benchmark-high-arity"])
    p.add_argument("--merkle-hash", default="poseidon2",
                   choices=["poseidon2", "keccak-f"])
    p.add_argument("--prover", default="host", choices=["host", "fast"],
                   help="host = host-transcript prover; fast = the "
                        "two-dispatch device-Fiat-Shamir prover")
    p.add_argument("--repeat", type=int, default=1,
                   help="prove N times; report each (steady-state timing)")
    pc = sub.add_parser("pcs-comparison")
    pc.add_argument("--field", default="koala-bear",
                    choices=["koala-bear", "baby-bear"])
    pc.add_argument("--log-trace-length", type=int, default=10)
    pc.add_argument("--width", type=int, default=8)
    pc.add_argument("--fri", default="testing",
                    choices=["testing", "benchmark",
                             "benchmark-high-arity"])
    pc.add_argument("--log-blowup", type=int, default=2)
    pc.add_argument("--log-folding-factor", type=int, default=2)
    pc.add_argument("--security-level", type=int, default=60)
    pc.add_argument("--max-pow-bits", type=int, default=12)
    args = ap.parse_args(argv)
    if args.cmd == "prove":
        cmd_prove(args)
    elif args.cmd == "pcs-comparison":
        cmd_pcs_comparison(args)


if __name__ == "__main__":
    main()
