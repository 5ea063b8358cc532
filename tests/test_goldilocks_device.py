"""Goldilocks device kernels: host/device lockstep (VERDICT round-2 #8;
capability bar: goldilocks/src/aarch64_neon/poseidon2_asm.rs)."""

import numpy as np

from plonky3_tpu.fields.goldilocks import Goldilocks
from plonky3_tpu.fields import goldilocks_device as gd
from plonky3_tpu.hashes.poseidon2_goldilocks import (
    poseidon2_goldilocks_permute,
)

import jax
import jax.numpy as jnp

P = Goldilocks.P

# eager per-op dispatch costs ~100 ms in this environment — jit every
# kernel under test (the shipped call sites are jitted too)
_add = jax.jit(gd.add)
_sub = jax.jit(gd.sub)
_mul = jax.jit(gd.mul)
_neg = jax.jit(gd.neg)
_sq = jax.jit(gd.square)


def _pairs(x64):
    lo, hi = gd.split_np(x64)
    return jnp.asarray(lo), jnp.asarray(hi)


def _back(pair):
    return gd.join_np(np.asarray(pair[0]), np.asarray(pair[1]))


EDGE = np.array(
    [0, 1, 2, 0xFFFFFFFF, 0x100000000, P - 1, P - 2,
     0xFFFFFFFF00000000, 0x7FFFFFFFFFFFFFFF, 0x123456789ABCDEF],
    np.uint64,
)


def _rand_vals(rng, n):
    v = rng.integers(0, P, size=n, dtype=np.uint64)
    return np.concatenate([EDGE, v])


def test_gl_device_add_sub_mul_lockstep():
    rng = np.random.default_rng(0)
    a = _rand_vals(rng, 4096)
    b = np.flip(_rand_vals(rng, 4096)).copy()
    A, B = _pairs(a), _pairs(b)
    a_i = a.astype(object)
    b_i = b.astype(object)
    assert (_back(_add(A, B)) == (a_i + b_i) % P).all()
    assert (_back(_sub(A, B)) == (a_i - b_i) % P).all()
    assert (_back(_mul(A, B)) == (a_i * b_i) % P).all()
    assert (_back(_neg(A)) == (-a_i) % P).all()
    assert (_back(_sq(A)) == (a_i * a_i) % P).all()


def test_gl_device_mul_edge_pairs():
    """All edge x edge products (covers every carry/borrow path)."""
    n = len(EDGE)
    a = np.repeat(EDGE, n)
    b = np.tile(EDGE, n)
    got = _back(_mul(_pairs(a), _pairs(b)))
    want = (a.astype(object) * b.astype(object)) % P
    assert (got == want).all()


def test_gl_device_poseidon2_kat_and_lockstep():
    # one batch, ONE compile: row 0 is the reference KAT input
    # (goldilocks/src/poseidon2.rs:1236-1253), rows 1.. random lockstep
    rng = np.random.default_rng(3)
    states = rng.integers(0, P, size=(8, 8), dtype=np.uint64)
    states[0] = np.arange(8, dtype=np.uint64)
    lo, hi = gd.split_np(states)
    out = gd._PERM_JIT((jnp.asarray(lo), jnp.asarray(hi)))
    got = gd.join_np(np.asarray(out[0]), np.asarray(out[1]))
    assert [int(x) for x in got[0]] == [
        0x020CF04A1B214D14, 0x84E14AAAEACAED25,
        0x1AE0F640E81C7457, 0xA4D204CBAEB0D8A5,
        0x0CF637B627B3A7FF, 0x788D304D948B486B,
        0x7327133EA1949AF4, 0xF415ABB924DA395B,
    ]
    for i in range(8):
        want = poseidon2_goldilocks_permute([int(x) for x in states[i]])
        assert [int(x) for x in got[i]] == want


def test_gl_device_merkle_commit_matches_host():
    rng = np.random.default_rng(5)
    mat = rng.integers(0, P, size=(4, 8), dtype=np.uint64)
    root = gd.gl_merkle_commit_device(mat)
    # host reference: same leaf/compress schedule with exact ints
    digests = [
        poseidon2_goldilocks_permute([int(x) for x in row])[:4]
        for row in mat
    ]
    while len(digests) > 1:
        nxt = []
        for i in range(0, len(digests), 2):
            nxt.append(
                poseidon2_goldilocks_permute(
                    digests[i] + digests[i + 1]
                )[:4]
            )
        digests = nxt
    assert list(root) == [int(x) for x in digests[0]]
