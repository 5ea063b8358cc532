"""Merkle-cap commitments (merkle_tree.rs:182-198 cap(), mmcs/mod.rs
cap_height ctor arg): the commitment is the layer cap_height levels below
the root; proofs are cap_height siblings shorter; verification compares
against the indexed cap entry."""

import numpy as np
import pytest

from plonky3_tpu.fields import BabyBear as F
from plonky3_tpu.hashes.poseidon2 import default_poseidon2
from plonky3_tpu.hashes.sponge import PaddingFreeSponge, TruncatedPermutation
from plonky3_tpu.merkle.mmcs import MerkleTreeMmcs


def _mmcs(cap_height):
    p16 = default_poseidon2(F, 16)
    p24 = default_poseidon2(F, 24)
    return MerkleTreeMmcs(
        sponge=PaddingFreeSponge(p24, rate=16, out=8),
        compressor=TruncatedPermutation(p16, chunk=8),
        cap_height=cap_height,
    )


def _mats(heights, widths, seed=0):
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp

    return [
        jnp.asarray(
            F.to_monty_np(
                rng.integers(0, F.P, size=(h, w), dtype=np.uint64)
            )
        )
        for h, w in zip(heights, widths)
    ]


@pytest.mark.parametrize("cap_height", [1, 2, 3])
def test_cap_single_open_roundtrip(cap_height):
    mmcs0 = _mmcs(0)
    mmcs = _mmcs(cap_height)
    mats = _mats([32, 32, 16], [3, 2, 4])
    data0 = mmcs0.commit(mats)
    data = mmcs.commit(mats)
    # the cap is the actual tree layer: compressing it yields the root
    assert data.root_std == data0.root_std
    assert len(data.commitment) == 1 << cap_height
    dims = [(m.shape[0], m.shape[1]) for m in mats]
    for index in [0, 5, 17, 31]:
        rows, proof = mmcs.open_batch(data, index)
        assert len(proof) == 5 - cap_height
        assert mmcs.verify_batch(data.commitment, dims, index, rows, proof)
        # tamper: wrong index
        assert not mmcs.verify_batch(
            data.commitment, dims, index ^ 1, rows, proof
        )
        # tamper: flip a cap digest entry
        bad_cap = [list(d) for d in data.commitment]
        bad_cap[index >> (5 - cap_height)][0] ^= 1
        assert not mmcs.verify_batch(
            tuple(tuple(d) for d in bad_cap), dims, index, rows, proof
        )


def test_cap_zero_commitment_is_root():
    mmcs = _mmcs(0)
    mats = _mats([8], [2])
    data = mmcs.commit(mats)
    assert data.commitment == data.root_std


def test_cap_pruned_multi_open_roundtrip():
    mmcs = _mmcs(2)
    mats = _mats([64, 16], [3, 2])
    data = mmcs.commit(mats)
    dims = [(64, 3), (16, 2)]
    indices = [0, 3, 3, 40, 63]
    rows_pq, sibs = mmcs.open_multi_batch(data, indices)
    assert mmcs.verify_multi_batch(
        data.commitment, dims, indices, rows_pq, sibs
    )
    bad = [list(d) for d in data.commitment]
    bad[0] = tuple((x + 1) % F.P for x in bad[0])
    assert not mmcs.verify_multi_batch(
        tuple(tuple(d) for d in bad), dims, indices, rows_pq, sibs
    )


def test_cap_multi_open_unpruned():
    mmcs = _mmcs(1)
    mats = _mats([16], [2])
    data = mmcs.commit(mats)
    dims = [(16, 2)]
    indices = [1, 9]
    rows_pq, proofs_pq = mmcs.open_batch_many(data, indices)
    assert all(len(p) == 3 for p in proofs_pq)
    assert mmcs.verify_batch_many(
        data.commitment, dims, indices, rows_pq, proofs_pq
    )


def test_challenger_observes_cap_like_digests():
    from plonky3_tpu.challenger.duplex import DuplexChallenger

    perm = default_poseidon2(F, 16)
    ch1 = DuplexChallenger(perm, rate=8)
    ch2 = DuplexChallenger(perm, rate=8)
    cap = ((1, 2, 3, 4, 5, 6, 7, 8), (9, 10, 11, 12, 13, 14, 15, 16))
    ch1.observe_digest(cap)
    for d in cap:
        ch2.observe_many(d)
    assert ch1.sample() == ch2.sample()
