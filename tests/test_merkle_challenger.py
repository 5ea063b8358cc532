"""Merkle MMCS commit/open/verify round-trips + challenger behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky3_tpu.fields import KoalaBear
from plonky3_tpu.hashes.poseidon2 import default_poseidon2
from plonky3_tpu.hashes.sponge import PaddingFreeSponge, TruncatedPermutation
from plonky3_tpu.merkle.mmcs import MerkleTreeMmcs
from plonky3_tpu.challenger.duplex import DuplexChallenger

F = KoalaBear


@pytest.fixture(scope="module")
def mmcs():
    p16 = default_poseidon2(F, 16)
    p24 = default_poseidon2(F, 24)
    return MerkleTreeMmcs(
        sponge=PaddingFreeSponge(p24, rate=16, out=8),
        compressor=TruncatedPermutation(p16, chunk=8),
    )


def test_sponge_device_host_agree(rng, mmcs):
    mat = F.rand_np(rng, (8, 21))
    dev = F.from_monty_np(
        np.asarray(mmcs.sponge.hash_rows_device([jnp.asarray(mat)]))
    )
    for i in range(8):
        host = mmcs.sponge.hash_iter_host(
            int(x) for x in F.from_monty_np(mat[i])
        )
        np.testing.assert_array_equal(dev[i], np.array(host, np.uint32))


def test_commit_open_verify_single(rng, mmcs):
    mat = F.rand_np(rng, (64, 5))
    data = mmcs.commit([jnp.asarray(mat)])
    for index in [0, 1, 31, 63]:
        rows, proof = mmcs.open_batch(data, index)
        assert mmcs.verify_batch(data.root_std, [(64, 5)], index, rows, proof)
        # tamper: flip a value
        bad = [list(rows[0])]
        bad[0][0] = (bad[0][0] + 1) % F.P
        assert not mmcs.verify_batch(
            data.root_std, [(64, 5)], index, bad, proof
        )
        # tamper: wrong index
        assert not mmcs.verify_batch(
            data.root_std, [(64, 5)], index ^ 1, rows, proof
        )


def test_commit_multiple_same_height(rng, mmcs):
    a = F.rand_np(rng, (32, 3))
    b = F.rand_np(rng, (32, 4))
    data = mmcs.commit([jnp.asarray(a), jnp.asarray(b)])
    rows, proof = mmcs.open_batch(data, 7)
    assert len(rows[0]) == 3 and len(rows[1]) == 4
    assert mmcs.verify_batch(
        data.root_std, [(32, 3), (32, 4)], 7, rows, proof
    )
    # width binding: swapped dims must fail
    assert not mmcs.verify_batch(
        data.root_std, [(32, 4), (32, 3)], 7, rows, proof
    )


def test_commit_mixed_heights(rng, mmcs):
    a = F.rand_np(rng, (32, 2))
    b = F.rand_np(rng, (8, 3))
    data = mmcs.commit([jnp.asarray(a), jnp.asarray(b)])
    for index in [0, 13, 31]:
        rows, proof = mmcs.open_batch(data, index)
        assert mmcs.verify_batch(
            data.root_std, [(32, 2), (8, 3)], index, rows, proof
        )
        # opened short-matrix row follows the index-shift rule
        np.testing.assert_array_equal(
            rows[1],
            F.from_monty_np(b[index >> 2]).astype(np.int64),
        )


def test_root_deterministic(rng, mmcs):
    mat = F.rand_np(rng, (16, 2))
    r1 = mmcs.commit([jnp.asarray(mat)]).root_std
    r2 = mmcs.commit([jnp.asarray(mat)]).root_std
    assert r1 == r2
    mat2 = mat.copy()
    mat2[3, 1] ^= 1
    assert mmcs.commit([jnp.asarray(mat2)]).root_std != r1


# ---------------------------------------------------------------------
# challenger


def fresh_challenger():
    return DuplexChallenger(default_poseidon2(F, 24), rate=16)


def test_challenger_deterministic_and_sensitive():
    c1, c2 = fresh_challenger(), fresh_challenger()
    for c in (c1, c2):
        c.observe_many([1, 2, 3])
    assert c1.sample() == c2.sample()
    c3 = fresh_challenger()
    c3.observe_many([1, 2, 4])
    c4 = fresh_challenger()
    c4.observe_many([1, 2, 3])
    assert c3.sample() != c4.sample()


def test_challenger_absorb_length_tag():
    """Observing [x] vs [x, 0] must differ (length tag in capacity)."""
    c1, c2 = fresh_challenger(), fresh_challenger()
    c1.observe(5)
    c2.observe(5)
    c2.observe(0)
    assert c1.sample() != c2.sample()


def test_challenger_sample_pops_from_end():
    """First sample equals permuted state[RATE-1] (Vec::pop semantics)."""
    c = fresh_challenger()
    c.observe(42)
    perm = default_poseidon2(F, 24)
    state = [0] * 24
    state[0] = 42
    state[16] = 1  # length tag
    out = perm.permute_host(state)
    assert c.sample() == out[15]
    assert c.sample() == out[14]


def test_challenger_samples_reflect_new_inputs():
    c = fresh_challenger()
    c.observe(1)
    s1 = c.sample()
    c.observe(2)
    s2 = c.sample()
    # a fresh duplexing must have occurred after the new observation
    c2 = fresh_challenger()
    c2.observe(1)
    assert c2.sample() == s1
    assert s1 != s2


@pytest.mark.parametrize("bits", [1, 4, 8])
def test_grind_and_check(bits):
    c = fresh_challenger()
    c.observe_many([9, 8, 7])
    w = c.grind(bits)
    # verifier side replays
    v = fresh_challenger()
    v.observe_many([9, 8, 7])
    assert v.check_witness(bits, w)
    # witness is minimal: all smaller candidates fail
    for cand in range(w):
        v2 = fresh_challenger()
        v2.observe_many([9, 8, 7])
        assert not v2.check_witness(bits, cand)


def test_grind_zero_bits():
    c = fresh_challenger()
    assert c.grind(0) == 0


def test_hash_challenger_generic():
    """challenger/src/hash_challenger.rs semantics over the Poseidon2
    sponge: chained digests, end-pop sampling, observe clears output."""
    from plonky3_tpu.challenger.hash_challenger import HashChallenger
    from plonky3_tpu.hashes.poseidon2 import default_poseidon2
    from plonky3_tpu.hashes.sponge import PaddingFreeSponge
    from plonky3_tpu.fields.params import KoalaBear as F

    sponge = PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8)
    a = HashChallenger(sponge, F)
    b = HashChallenger(sponge, F)
    for v in (1, 2, 3):
        a.observe(v)
        b.observe(v)
    s = [a.sample() for _ in range(10)]
    assert s == [b.sample() for _ in range(10)]
    assert all(0 <= x < F.P for x in s)
    # observing invalidates pending outputs
    c = HashChallenger(sponge, F)
    c.observe(1)
    c.sample()
    c.observe(2)
    d = HashChallenger(sponge, F)
    d.observe(1)
    d.sample()
    d.observe(3)
    assert c.sample() != d.sample()
    # grind + check_witness round-trip
    e = HashChallenger(sponge, F)
    e.observe(5)
    w = e.grind(4)
    v = HashChallenger(sponge, F)
    v.observe(5)
    assert v.check_witness(4, w)
