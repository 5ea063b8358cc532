"""Property-based conformance suites (hypothesis) — the
`field-testing` crate's reusable axiom/proptest layer
(field-testing/src/lib.rs:38-46, dft_testing.rs, extension_testing.rs,
packedfield_testing.rs). Strategies draw raw integers; every suite runs
per concrete field.

Device work stays host-side numpy inside hypothesis loops (device
dispatch per example would dominate); the device-vs-host lockstep
property batches all drawn values into ONE device call.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from plonky3_tpu.fields import (
    BabyBear,
    BabyBearExt4,
    KoalaBear,
    KoalaBearExt4,
)
from plonky3_tpu.fields.goldilocks import Goldilocks
from plonky3_tpu.fields.mersenne31 import M31Ext3, Mersenne31

FIELDS = [KoalaBear, BabyBear, Mersenne31]
EXTS = [KoalaBearExt4, BabyBearExt4, M31Ext3]

SETTINGS = settings(max_examples=40, deadline=None)


def elems(F):
    return st.integers(min_value=0, max_value=F.P - 1)


def ext_elems(E):
    return st.tuples(
        *[st.integers(0, E.base.P - 1) for _ in range(E.D)]
    )


# ---------------------------------------------------------------------------
# base-field axioms (field-testing/src/lib.rs test_ring_with_eq analog)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("F", FIELDS + [Goldilocks])
def test_field_axioms(F):
    @SETTINGS
    @given(st.data())
    def run(data):
        a = data.draw(elems(F))
        b = data.draw(elems(F))
        c = data.draw(elems(F))
        assert F.add_h(a, b) == F.add_h(b, a)
        assert F.mul_h(a, b) == F.mul_h(b, a)
        assert F.mul_h(a, F.mul_h(b, c)) == F.mul_h(F.mul_h(a, b), c)
        assert F.mul_h(a, F.add_h(b, c)) == F.add_h(
            F.mul_h(a, b), F.mul_h(a, c)
        )
        assert F.add_h(a, F.neg_h(a)) == 0
        if a != 0:
            assert F.mul_h(a, F.inv_h(a)) == 1
        # Fermat / exp consistency
        assert F.exp_h(a, F.P) == a

    run()


@pytest.mark.parametrize("F", FIELDS)
def test_two_adic_generator_consistency(F):
    """Squaring-consistent 2-adic chain (field.rs:1267 contract)."""
    for bits in range(1, min(F.TWO_ADICITY, 12) + 1):
        g = F.two_adic_generator_h(bits)
        assert F.exp_h(g, 1 << bits) == 1
        assert F.exp_h(g, 1 << (bits - 1)) == F.P - 1
        assert F.mul_h(g, g) == F.two_adic_generator_h(bits - 1) or (
            bits == 1
        )


# ---------------------------------------------------------------------------
# extension axioms + Frobenius (extension_testing.rs analog)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("E", EXTS)
def test_extension_axioms(E):
    @SETTINGS
    @given(st.data())
    def run(data):
        a = data.draw(ext_elems(E))
        b = data.draw(ext_elems(E))
        c = data.draw(ext_elems(E))
        assert E.mul_h(a, b) == E.mul_h(b, a)
        assert E.mul_h(a, E.mul_h(b, c)) == E.mul_h(E.mul_h(a, b), c)
        assert E.mul_h(a, E.add_h(b, c)) == E.add_h(
            E.mul_h(a, b), E.mul_h(a, c)
        )
        if a != E.zero_h():
            assert E.mul_h(a, E.inv_h(a)) == E.one_h()
        # Frobenius is the p-power map and fixes the base field
        base = E.from_base_h(a[0])
        assert E.frobenius_h(base) == base
        assert E.frobenius_h(a) == E.exp_h(a, E.base.P)

    run()


# ---------------------------------------------------------------------------
# DFT vs naive + structure (dft_testing.rs analog)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("F", [KoalaBear, BabyBear])
def test_dft_vs_naive_and_inverse(F):
    from plonky3_tpu.ops.ntt import dft, idft

    @settings(max_examples=8, deadline=None)
    @given(st.data())
    def run(data):
        log_n = data.draw(st.integers(1, 5))
        n = 1 << log_n
        vals = [
            data.draw(elems(F)) for _ in range(2 * n)
        ]
        mat = np.asarray(vals, np.uint32).reshape(n, 2)
        dev = jnp.asarray(F.to_monty_np(mat))
        got = F.from_monty_np(np.asarray(dft(F, dev)))
        # naive O(n^2) host DFT
        g = F.two_adic_generator_h(log_n)
        for j in range(2):
            for k in range(n):
                acc = 0
                for i in range(n):
                    acc = F.add_h(
                        acc,
                        F.mul_h(
                            int(mat[i, j]), F.exp_h(g, (i * k) % n)
                        ),
                    )
                assert int(got[k, j]) == acc
        # idft(dft(x)) == x
        back = F.from_monty_np(np.asarray(idft(F, dft(F, dev))))
        assert (back == mat).all()

    run()


@pytest.mark.parametrize("F", [KoalaBear])
def test_coset_lde_matches_padded_dft(F):
    """coset_lde_batch == naive evaluate-everywhere on the shifted coset
    (dft_testing.rs LDE-matches-padded-DFT)."""
    from plonky3_tpu.ops.ntt import coset_lde_batch
    from plonky3_tpu.utils.bits import bitrev_permute_axis0

    @settings(max_examples=6, deadline=None)
    @given(st.data())
    def run(data):
        log_n = data.draw(st.integers(1, 4))
        n = 1 << log_n
        shift = data.draw(st.integers(1, F.P - 1))
        col = [data.draw(elems(F)) for _ in range(n)]
        mat = np.asarray(col, np.uint32).reshape(n, 1)
        out = coset_lde_batch(
            F, jnp.asarray(F.to_monty_np(mat)), 1, shift
        )
        got = F.from_monty_np(
            np.asarray(bitrev_permute_axis0(out, log_n + 1))
        )
        # interpolate on H (size n), evaluate on shift*K (size 2n)
        g = F.two_adic_generator_h(log_n)
        G = F.two_adic_generator_h(log_n + 1)
        inv_n = F.inv_h(n)
        coeffs = []
        for i in range(n):
            acc = 0
            for k in range(n):
                acc = F.add_h(
                    acc,
                    F.mul_h(col[k], F.exp_h(F.inv_h(g), (i * k) % n)),
                )
            coeffs.append(F.mul_h(acc, inv_n))
        for k in range(2 * n):
            x = F.mul_h(shift, F.exp_h(G, k))
            acc, xp = 0, 1
            for c in coeffs:
                acc = F.add_h(acc, F.mul_h(c, xp))
                xp = F.mul_h(xp, x)
            assert int(got[k, 0]) == acc

    run()


# ---------------------------------------------------------------------------
# device-vs-host lockstep (packedfield_testing.rs analog: the device
# kernels ARE the packed backend)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("F", FIELDS)
def test_device_host_lockstep(F):
    @settings(max_examples=10, deadline=None)
    @given(st.data())
    def run(data):
        vals = [data.draw(elems(F)) for _ in range(32)]
        a = np.asarray(vals[:16], np.uint32)
        b = np.asarray(vals[16:], np.uint32)
        am, bm = F.to_monty_np(a), F.to_monty_np(b)
        ad, bd = jnp.asarray(am), jnp.asarray(bm)
        for dev_op, host_op in [
            (F.add, F.add_h),
            (F.sub, F.sub_h),
            (F.mul, F.mul_h),
        ]:
            got = F.from_monty_np(np.asarray(dev_op(ad, bd)))
            want = [host_op(int(x), int(y)) for x, y in zip(a, b)]
            assert [int(v) for v in got] == want

    run()


def test_mul_shoup_matches_mul():
    """Shoup twiddle product == generic Monty product for every field
    (the NTT kernels' correctness contract)."""
    F = KoalaBear

    @settings(max_examples=15, deadline=None)
    @given(st.data())
    def run(data):
        a = np.asarray(
            [data.draw(elems(F)) for _ in range(16)], np.uint32
        )
        w = np.asarray(
            [data.draw(elems(F)) for _ in range(16)], np.uint32
        )
        am = F.to_monty_np(a)
        wm = F.to_monty_np(w)
        want = F.from_monty_np(
            np.asarray(F.mul(jnp.asarray(am), jnp.asarray(wm)))
        )
        got = F.from_monty_np(
            np.asarray(
                F.mul_shoup(
                    jnp.asarray(am),
                    jnp.asarray(w),
                    jnp.asarray(F.shoup_np(w)),
                )
            )
        )
        assert (got == want).all()

    run()
