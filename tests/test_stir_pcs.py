"""TwoAdicStirPcs round-trips + tamper rejection (model: stir/src/pcs.rs
tests)."""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky3_tpu.challenger.duplex import DuplexChallenger
from plonky3_tpu.fields import KoalaBear as F, KoalaBearExt4 as E
from plonky3_tpu.hashes.poseidon2 import default_poseidon2
from plonky3_tpu.hashes.sponge import PaddingFreeSponge, TruncatedPermutation
from plonky3_tpu.merkle.extension_mmcs import ExtensionMmcs
from plonky3_tpu.merkle.mmcs import MerkleTreeMmcs
from plonky3_tpu.stir import StirError, StirParameters
from plonky3_tpu.stir.pcs import TwoAdicStirPcs


def make_pcs():
    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
    )
    return TwoAdicStirPcs(
        F=F,
        E=E,
        params=StirParameters(
            log_blowup=2,
            log_folding_factor=2,
            security_level=60,
            max_pow_bits=12,
        ),
        mmcs=mmcs,
        stir_mmcs=ExtensionMmcs(inner=mmcs, D=E.D),
    )


def fresh_challenger():
    return DuplexChallenger(default_poseidon2(F, 24), rate=16)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def commit_and_open(pcs, rng, specs, points_per_mat):
    evals_std = [
        rng.integers(0, F.P, (1 << ln, w), dtype=np.uint64).astype(
            np.uint32
        )
        for ln, w in specs
    ]
    domains = [pcs.natural_domain_for_degree(1 << ln) for ln, _ in specs]
    mats = [jnp.asarray(F.to_monty_np(e)) for e in evals_std]
    data = pcs.commit(list(zip(domains, mats)))
    ch = fresh_challenger()
    ch.observe_many(data.root_std)
    opened, proof = pcs.open([(data, points_per_mat)], ch)
    return evals_std, domains, data, opened, proof


def test_stir_pcs_round_trip_single(rng):
    pcs = make_pcs()
    z = E.rand_h(rng)
    _, domains, data, opened, proof = commit_and_open(
        pcs, rng, [(6, 3)], [[z]]
    )
    vch = fresh_challenger()
    vch.observe_many(data.root_std)
    pcs.verify(
        [(data.root_std, [(domains[0], [(z, opened[0][0][0])])])],
        proof,
        vch,
    )


def test_stir_pcs_round_trip_two_points(rng):
    pcs = make_pcs()
    z1, z2 = E.rand_h(rng), E.rand_h(rng)
    _, domains, data, opened, proof = commit_and_open(
        pcs, rng, [(7, 2)], [[z1, z2]]
    )
    vch = fresh_challenger()
    vch.observe_many(data.root_std)
    pcs.verify(
        [
            (
                data.root_std,
                [
                    (
                        domains[0],
                        [(z1, opened[0][0][0]), (z2, opened[0][0][1])],
                    )
                ],
            )
        ],
        proof,
        vch,
    )


def test_stir_pcs_rejects_wrong_eval(rng):
    pcs = make_pcs()
    z = E.rand_h(rng)
    _, domains, data, opened, proof = commit_and_open(
        pcs, rng, [(6, 2)], [[z]]
    )
    ys = list(opened[0][0][0])
    ys[0] = tuple((x + 1) % F.P for x in ys[0])
    vch = fresh_challenger()
    vch.observe_many(data.root_std)
    with pytest.raises(StirError):
        pcs.verify(
            [(data.root_std, [(domains[0], [(z, ys)])])], proof, vch
        )


def test_stir_pcs_rejects_tampered_input_row(rng):
    pcs = make_pcs()
    z = E.rand_h(rng)
    _, domains, data, opened, proof = commit_and_open(
        pcs, rng, [(6, 2)], [[z]]
    )
    bp = proof[0]
    for opening in bp.input_openings:
        if opening is None:
            continue
        rows_pq, _ = opening
        rows_pq[0][0][0] = (int(rows_pq[0][0][0]) + 1) % F.P
    vch = fresh_challenger()
    vch.observe_many(data.root_std)
    with pytest.raises(StirError):
        pcs.verify(
            [(data.root_std, [(domains[0], [(z, opened[0][0][0])])])],
            proof,
            vch,
        )
