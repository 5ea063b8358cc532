"""Field axiom + bit-exactness tests (model: field-testing/src/lib.rs suites).

Device uint32-limb arithmetic is checked in lockstep against exact Python
integer arithmetic — the TPU analog of the reference's packed-vs-scalar
lockstep tests (field-testing/src/packedfield_testing.rs).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from plonky3_tpu.fields import (
    BabyBear,
    BabyBearExt4,
    KoalaBear,
    KoalaBearExt4,
    KoalaBearExt8,
)

FIELDS = [KoalaBear, BabyBear]
EXTS = [KoalaBearExt4, BabyBearExt4, KoalaBearExt8]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
class TestMonty31:
    def test_monty_roundtrip(self, F, rng):
        x = rng.integers(0, F.P, 1000, dtype=np.uint64).astype(np.uint32)
        m = F.to_monty_np(x)
        back = F.from_monty_np(m)
        np.testing.assert_array_equal(back, x)
        # device conversion agrees with host conversion
        dev = F.to_monty(jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(dev), m)
        np.testing.assert_array_equal(np.asarray(F.from_monty(jnp.asarray(m))), x)

    def test_ops_lockstep(self, F, rng):
        n = 4096
        a = rng.integers(0, F.P, n, dtype=np.uint64)
        b = rng.integers(0, F.P, n, dtype=np.uint64)
        am = jnp.asarray(F.to_monty_np(a))
        bm = jnp.asarray(F.to_monty_np(b))
        p = np.uint64(F.P)

        got = F.from_monty_np(np.asarray(F.add(am, bm)))
        np.testing.assert_array_equal(got, ((a + b) % p).astype(np.uint32))

        got = F.from_monty_np(np.asarray(F.sub(am, bm)))
        np.testing.assert_array_equal(got, ((a + p - b) % p).astype(np.uint32))

        got = F.from_monty_np(np.asarray(F.mul(am, bm)))
        np.testing.assert_array_equal(got, ((a * b) % p).astype(np.uint32))

        got = F.from_monty_np(np.asarray(F.neg(am)))
        np.testing.assert_array_equal(got, ((p - a) % p).astype(np.uint32))

        got = F.from_monty_np(np.asarray(F.halve(am)))
        inv2 = pow(2, F.P - 2, F.P)
        np.testing.assert_array_equal(
            got, ((a * np.uint64(inv2)) % p).astype(np.uint32)
        )

    def test_mul_edge_cases(self, F):
        edge = [0, 1, 2, F.P - 1, F.P - 2, (F.P - 1) // 2, F.P // 2]
        vals = np.array(
            [(x, y) for x in edge for y in edge], dtype=np.uint64
        )
        a, b = vals[:, 0], vals[:, 1]
        am = jnp.asarray(F.to_monty_np(a))
        bm = jnp.asarray(F.to_monty_np(b))
        got = F.from_monty_np(np.asarray(F.mul(am, bm)))
        want = ((a * b) % np.uint64(F.P)).astype(np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_inverse(self, F, rng):
        a = rng.integers(1, F.P, 256, dtype=np.uint64)
        am = jnp.asarray(F.to_monty_np(a))
        prod = F.from_monty_np(np.asarray(F.mul(am, F.inv(am))))
        np.testing.assert_array_equal(prod, np.ones(256, np.uint32))

    def test_exp(self, F, rng):
        a = rng.integers(0, F.P, 64, dtype=np.uint64)
        am = jnp.asarray(F.to_monty_np(a))
        for e in [0, 1, 2, 3, 7, F.P - 2, 12345]:
            got = F.from_monty_np(np.asarray(F.exp(am, e)))
            want = np.array([pow(int(x), e, F.P) for x in a], np.uint32)
            np.testing.assert_array_equal(got, want)

    def test_two_adic_generators(self, F):
        """Chain consistency: g[i]^2 == g[i-1]; g[i] has exact order 2^i."""
        gens = F.TWO_ADIC_GENERATORS
        assert gens[0] == 1
        for i in range(1, len(gens)):
            assert F.mul_h(gens[i], gens[i]) == gens[i - 1]
        top = gens[F.TWO_ADICITY]
        assert F.exp_h(top, 1 << F.TWO_ADICITY) == 1
        assert F.exp_h(top, 1 << (F.TWO_ADICITY - 1)) == F.P - 1

    def test_sum(self, F, rng):
        a = rng.integers(0, F.P, (129, 7), dtype=np.uint64)
        am = jnp.asarray(F.to_monty_np(a))
        got = F.from_monty_np(np.asarray(F.sum(am, axis=0)))
        want = (a.sum(axis=0) % np.uint64(F.P)).astype(np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_mul_small(self, F, rng):
        a = rng.integers(0, F.P, 128, dtype=np.uint64)
        am = jnp.asarray(F.to_monty_np(a))
        for k in [0, 1, 2, 3, 4, 11, 31, 1 << 20]:
            got = F.from_monty_np(np.asarray(F.mul_small(am, k)))
            want = ((a * np.uint64(k % F.P)) % np.uint64(F.P)).astype(np.uint32)
            np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("E", EXTS, ids=lambda e: e.name)
class TestExtension:
    def test_host_field_axioms(self, E, rng):
        for _ in range(20):
            a, b, c = E.rand_h(rng), E.rand_h(rng), E.rand_h(rng)
            assert E.mul_h(a, b) == E.mul_h(b, a)
            assert E.mul_h(a, E.mul_h(b, c)) == E.mul_h(E.mul_h(a, b), c)
            assert E.mul_h(a, E.add_h(b, c)) == E.add_h(
                E.mul_h(a, b), E.mul_h(a, c)
            )
            assert E.mul_h(a, E.one_h()) == a
            if any(a):
                assert E.mul_h(a, E.inv_h(a)) == E.one_h()

    def test_device_lockstep(self, E, rng):
        n = 512
        a = [E.rand_h(rng) for _ in range(n)]
        b = [E.rand_h(rng) for _ in range(n)]
        ad = jnp.asarray(np.stack([E.to_monty_np(x) for x in a]))
        bd = jnp.asarray(np.stack([E.to_monty_np(x) for x in b]))

        got = np.asarray(E.mul(ad, bd))
        want = np.stack([E.to_monty_np(E.mul_h(x, y)) for x, y in zip(a, b)])
        np.testing.assert_array_equal(got, want)

        got = np.asarray(E.inv(ad))
        want = np.stack([E.to_monty_np(E.inv_h(x)) for x in a])
        np.testing.assert_array_equal(got, want)

    def test_frobenius_is_pth_power(self, E, rng):
        a = E.rand_h(rng)
        assert E.frobenius_h(a) == E.exp_h(a, E.base.P)

    def test_ext_generator_order(self, E):
        """EXT_GENERATOR generates: g^((q-1)/2) = -1 (order divisibility)."""
        q = E.base.P ** E.D
        g = E.EXT_GENERATOR
        val = E.exp_h(g, (q - 1) // 2)
        assert val == E.neg_h(E.one_h())

    def test_base_mul(self, E, rng):
        n = 64
        s = rng.integers(0, E.base.P, n, dtype=np.uint64)
        a = [E.rand_h(rng) for _ in range(n)]
        sd = jnp.asarray(E.base.to_monty_np(s))
        ad = jnp.asarray(np.stack([E.to_monty_np(x) for x in a]))
        got = np.asarray(E.base_mul(sd, ad))
        want = np.stack(
            [E.to_monty_np(E.base_mul_h(int(x), y)) for x, y in zip(s, a)]
        )
        np.testing.assert_array_equal(got, want)
