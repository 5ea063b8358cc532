"""Generalized Merkle tree: arity schedule, non-pow2 heights, caps
(model: merkle-tree/src/merkle_tree.rs + mmcs/geometry.rs tests)."""

import numpy as np
import pytest

from plonky3_tpu.fields.params import KoalaBear as F
from plonky3_tpu.hashes.keccak_sponge import (
    KeccakCompressor,
    KeccakFieldSponge,
)
from plonky3_tpu.hashes.poseidon2 import default_poseidon2
from plonky3_tpu.hashes.sponge import PaddingFreeSponge, TruncatedPermutation
from plonky3_tpu.merkle.generalized import (
    GeneralizedMerkleMmcs,
    next_pow2,
    padded_len,
    select_arity_step,
    valid_heights,
)


def poseidon_mmcs(arity=2, cap_height=0):
    return GeneralizedMerkleMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 24), chunk=8),
        arity=arity,
        cap_height=cap_height,
    )


def keccak_mmcs(arity=2, cap_height=0):
    return GeneralizedMerkleMmcs(
        sponge=KeccakFieldSponge(F),
        compressor=KeccakCompressor(),
        arity=arity,
        cap_height=cap_height,
    )


def _mats(rng, heights_widths):
    return [
        F.to_monty_np(
            rng.integers(0, F.P, (h, w), dtype=np.uint64).astype(
                np.uint32
            )
        )
        for h, w in heights_widths
    ]


def test_ladder_helpers():
    assert valid_heights(7) == [7, 4, 2, 1]
    assert valid_heights(10) == [10, 5, 3, 2, 1]
    assert padded_len(10, 4) == 12
    assert padded_len(3, 4) == 4
    assert padded_len(1, 4) == 1
    assert next_pow2(5) == 8
    # binary bridge forced by an intermediate matrix
    assert select_arity_step(4, 16, 16, [8]) == 2
    assert select_arity_step(4, 16, 16, [4]) == 4


@pytest.mark.parametrize("make", [poseidon_mmcs, keccak_mmcs])
def test_non_pow2_roundtrip(make):
    rng = np.random.default_rng(0)
    mmcs = make()
    mats = _mats(rng, [(10, 3), (5, 2), (3, 4)])
    data = mmcs.commit(mats)
    commitment = mmcs.commitment(data)
    dims = [(10, 3), (5, 2), (3, 4)]
    for idx in range(10):
        rows, proof = mmcs.open_batch(data, idx)
        assert mmcs.verify_batch(commitment, dims, idx, rows, proof)


@pytest.mark.parametrize("make", [keccak_mmcs])
def test_arity4_roundtrip(make):
    # poseidon2 width 24 cannot hold 4 x 8-element digests; the
    # reference's N-ary configs use the keccak compressor likewise
    rng = np.random.default_rng(1)
    mmcs = make(arity=4)
    mats = _mats(rng, [(64, 3), (16, 2)])
    data = mmcs.commit(mats)
    commitment = mmcs.commitment(data)
    dims = [(64, 3), (16, 2)]
    for idx in (0, 5, 31, 63):
        rows, proof = mmcs.open_batch(data, idx)
        assert mmcs.verify_batch(commitment, dims, idx, rows, proof)


def test_arity4_with_bridge_injection():
    rng = np.random.default_rng(2)
    mmcs = keccak_mmcs(arity=4)
    # 32 -> inject at 16 requires a binary bridge under arity 4
    mats = _mats(rng, [(32, 2), (16, 3), (8, 1)])
    data = mmcs.commit(mats)
    assert 2 in data.arity_schedule  # bridge step happened
    commitment = mmcs.commitment(data)
    dims = [(32, 2), (16, 3), (8, 1)]
    for idx in (0, 7, 19, 31):
        rows, proof = mmcs.open_batch(data, idx)
        assert mmcs.verify_batch(commitment, dims, idx, rows, proof)


def test_cap_commitment():
    rng = np.random.default_rng(3)
    mmcs = poseidon_mmcs(cap_height=2)
    mats = _mats(rng, [(32, 2)])
    data = mmcs.commit(mats)
    commitment = mmcs.commitment(data)
    assert len(commitment) == 4  # 2 binary levels below root
    dims = [(32, 2)]
    for idx in (0, 13, 31):
        rows, proof = mmcs.open_batch(data, idx)
        assert len(proof) == 3  # 5 levels - cap 2
        assert mmcs.verify_batch(commitment, dims, idx, rows, proof)


def test_rejects_tampered_row():
    rng = np.random.default_rng(4)
    mmcs = poseidon_mmcs()
    mats = _mats(rng, [(10, 3), (5, 2)])
    data = mmcs.commit(mats)
    commitment = mmcs.commitment(data)
    rows, proof = mmcs.open_batch(data, 4)
    rows[0][0] = (rows[0][0] + 1) % F.P
    assert not mmcs.verify_batch(
        commitment, [(10, 3), (5, 2)], 4, rows, proof
    )


def test_rejects_off_ladder_height():
    rng = np.random.default_rng(5)
    mmcs = poseidon_mmcs()
    with pytest.raises(AssertionError):
        mmcs.commit(_mats(rng, [(10, 2), (6, 2)]))  # 6 not on ladder
