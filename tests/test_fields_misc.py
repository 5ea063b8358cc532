"""Goldilocks + BN254: axioms, two-adic chains, numpy limb lockstep."""

import numpy as np
import pytest

from plonky3_tpu.fields.bn254 import BN254
from plonky3_tpu.fields.goldilocks import Goldilocks as G


def test_goldilocks_two_adic_chain():
    # squaring-consistent: g[i+1]^2 == g[i]; g[1] has order 2
    for i in range(32):
        assert G.mul_h(
            G.TWO_ADIC_GENERATORS[i + 1], G.TWO_ADIC_GENERATORS[i + 1]
        ) == G.TWO_ADIC_GENERATORS[i]
    assert G.TWO_ADIC_GENERATORS[1] == G.P - 1
    g32 = G.TWO_ADIC_GENERATORS[32]
    assert G.exp_h(g32, 1 << 32) == 1
    assert G.exp_h(g32, 1 << 31) != 1


def test_goldilocks_np_lockstep(rng):
    a = G.rand_np(rng, 300)
    b = G.rand_np(rng, 300)
    got_mul = G.mul_np(a, b)
    got_add = G.add_np(a, b)
    got_sub = G.sub_np(a, b)
    for i in range(0, 300, 37):
        ai, bi = int(a[i]), int(b[i])
        assert int(got_mul[i]) == (ai * bi) % G.P
        assert int(got_add[i]) == (ai + bi) % G.P
        assert int(got_sub[i]) == (ai - bi) % G.P
    # edge values
    edge = np.array([G.P - 1, G.P - 1, 0xFFFFFFFF, 1 << 32], np.uint64)
    m = G.mul_np(edge, edge)
    for i in range(4):
        assert int(m[i]) == (int(edge[i]) ** 2) % G.P


def test_goldilocks_inverse():
    rng = np.random.default_rng(1)
    for a in rng.integers(1, G.P, 10, dtype=np.uint64):
        a = int(a)
        assert G.mul_h(a, G.inv_h(a)) == 1


def test_bn254_field():
    assert (BN254.P - 1) % (1 << 28) == 0
    assert (BN254.P - 1) % (1 << 29) != 0
    a = 123456789123456789
    assert BN254.mul_h(a, BN254.inv_h(a)) == 1
    assert BN254.from_monty_h(BN254.to_monty_h(a)) == a
    g = BN254.two_adic_generator_h(28)
    assert BN254.exp_h(g, 1 << 28) == 1
    assert BN254.exp_h(g, 1 << 27) != 1
    assert BN254.two_adic_generator_h(1) == BN254.P - 1


# ---------------------------------------------------------------------------
# AIR composition (sub_builder / NamedAir / JoinedAir —
# uni-stark/src/sub_builder.rs:45, air/src/named.rs:20)
# ---------------------------------------------------------------------------
def test_joined_air_end_to_end():
    import jax.numpy as jnp
    import numpy as np

    from plonky3_tpu.air.composition import JoinedAir, NamedAir
    from plonky3_tpu.air.api import check_constraints
    from plonky3_tpu.fields import KoalaBear as KB, KoalaBearExt4 as E4
    from plonky3_tpu.fri.config import FriParameters
    from plonky3_tpu.models.fibonacci import (
        FibonacciAir,
        generate_fibonacci_trace,
    )
    from plonky3_tpu.stark.config import poseidon2_stark_config
    from plonky3_tpu.stark.prover import prove
    from plonky3_tpu.stark.verifier import verify

    # two independent Fibonacci gadget AIRs composed side by side
    air = JoinedAir(
        NamedAir("fib_a", FibonacciAir(KB)),
        NamedAir("fib_b", FibonacciAir(KB)),
    )
    t1, p1 = generate_fibonacci_trace(KB, 4)
    t2, p2 = generate_fibonacci_trace(KB, 4, a=2, b=3)
    trace = np.concatenate([t1, t2], axis=1)
    publics = p1 + p2
    assert check_constraints(air, trace, publics) == []
    cfg = poseidon2_stark_config(KB, E4, FriParameters.new_testing())
    proof = prove(cfg, air, jnp.asarray(KB.to_monty_np(trace)), publics)
    verify(cfg, air, proof, publics)

    # a broken half reports failures under ITS namespace
    bad = trace.copy()
    bad[3, 2] = (int(bad[3, 2]) + 1) % KB.P
    fails = check_constraints(air, bad, publics)
    assert fails and all(
        str(f["constraint"]).startswith("fib_b/") for f in fails
    )
