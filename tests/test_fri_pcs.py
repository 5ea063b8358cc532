"""End-to-end TwoAdicFriPcs tests: commit/open/verify round-trips, value
correctness vs naive interpolation, and tamper rejection (model:
fri/tests/{fri,pcs}.rs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky3_tpu.challenger.duplex import DuplexChallenger
from plonky3_tpu.commit.domain import TwoAdicCoset
from plonky3_tpu.fields import KoalaBear, KoalaBearExt4
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.fri.two_adic_pcs import TwoAdicFriPcs
from plonky3_tpu.fri.verifier import FriError
from plonky3_tpu.hashes.poseidon2 import default_poseidon2
from plonky3_tpu.hashes.sponge import PaddingFreeSponge, TruncatedPermutation
from plonky3_tpu.merkle.extension_mmcs import ExtensionMmcs
from plonky3_tpu.merkle.mmcs import MerkleTreeMmcs

F = KoalaBear
E = KoalaBearExt4


def make_pcs(fri_params=None):
    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
    )
    return TwoAdicFriPcs(
        F=F,
        E=E,
        fri=fri_params or FriParameters.new_testing(),
        mmcs=mmcs,
        fri_mmcs=ExtensionMmcs(inner=mmcs, D=E.D),
    )


def fresh_challenger():
    return DuplexChallenger(default_poseidon2(F, 24), rate=16)


def naive_eval_at_ext(evals_std, z):
    """Interpolate columns over the subgroup H (natural order, shift 1)
    and evaluate at ext point z — exact host oracle."""
    n, w = evals_std.shape
    log_n = n.bit_length() - 1
    g_inv = F.inv_h(F.two_adic_generator_h(log_n))
    n_inv = F.inv_h(n)
    out = []
    for j in range(w):
        # coefficients by naive inverse DFT
        coeffs = []
        for k in range(n):
            acc, xp = 0, 1
            x = F.exp_h(g_inv, k)
            for i in range(n):
                acc = (acc + int(evals_std[i, j]) * xp) % F.P
                xp = F.mul_h(xp, x)
            coeffs.append(F.mul_h(acc, n_inv))
        # Horner at z
        val = E.zero_h()
        for c in reversed(coeffs):
            val = E.add_h(E.mul_h(val, z), E.from_base_h(c))
        out.append(val)
    return out


@pytest.fixture(scope="module")
def pcs():
    return make_pcs()


def commit_and_open(pcs, rng, specs, points_per_mat):
    """specs: [(log_n, width)]; returns everything needed for verify."""
    evals_std = [
        rng.integers(0, F.P, (1 << ln, w), dtype=np.uint64).astype(np.uint32)
        for ln, w in specs
    ]
    domains = [pcs.natural_domain_for_degree(1 << ln) for ln, _ in specs]
    mats = [jnp.asarray(F.to_monty_np(e)) for e in evals_std]
    data = pcs.commit(list(zip(domains, mats)))

    ch = fresh_challenger()
    ch.observe_many(data.root_std)
    opened, proof = pcs.open([(data, points_per_mat)], ch)
    return evals_std, domains, data, opened, proof


def test_pcs_values_match_naive(rng, pcs):
    z = E.rand_h(rng)
    evals_std, domains, data, opened, proof = commit_and_open(
        pcs, rng, [(4, 3)], [[z]]
    )
    want = naive_eval_at_ext(evals_std[0], z)
    assert opened[0][0][0] == want


def test_pcs_round_trip_single(rng, pcs):
    z = E.rand_h(rng)
    evals_std, domains, data, opened, proof = commit_and_open(
        pcs, rng, [(5, 4)], [[z]]
    )
    vch = fresh_challenger()
    vch.observe_many(data.root_std)
    pcs.verify(
        [(data.root_std, [(domains[0], [(z, opened[0][0][0])])])],
        proof,
        vch,
    )


def test_pcs_round_trip_mixed_heights_two_points(rng, pcs):
    z1, z2 = E.rand_h(rng), E.rand_h(rng)
    evals_std, domains, data, opened, proof = commit_and_open(
        pcs, rng, [(6, 2), (4, 3)], [[z1, z2], [z1]]
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
                    ),
                    (domains[1], [(z1, opened[0][1][0])]),
                ],
            )
        ],
        proof,
        vch,
    )


def test_pcs_rejects_wrong_eval(rng, pcs):
    z = E.rand_h(rng)
    evals_std, domains, data, opened, proof = commit_and_open(
        pcs, rng, [(5, 2)], [[z]]
    )
    bad = list(opened[0][0][0])
    bad[0] = E.add_h(bad[0], E.one_h())
    vch = fresh_challenger()
    vch.observe_many(data.root_std)
    with pytest.raises(FriError):
        pcs.verify(
            [(data.root_std, [(domains[0], [(z, bad)])])], proof, vch
        )


def test_pcs_rejects_tampered_final_poly(rng, pcs):
    z = E.rand_h(rng)
    evals_std, domains, data, opened, proof = commit_and_open(
        pcs, rng, [(5, 2)], [[z]]
    )
    proof.final_poly = [E.add_h(proof.final_poly[0], E.one_h())] + list(
        proof.final_poly[1:]
    )
    vch = fresh_challenger()
    vch.observe_many(data.root_std)
    with pytest.raises(FriError):
        pcs.verify(
            [(data.root_std, [(domains[0], [(z, opened[0][0][0])])])],
            proof,
            vch,
        )


def test_pcs_rejects_tampered_commit(rng, pcs):
    z = E.rand_h(rng)
    evals_std, domains, data, opened, proof = commit_and_open(
        pcs, rng, [(5, 2)], [[z]]
    )
    bad_commit = list(proof.commit_phase_commits[0])
    bad_commit[0] = (bad_commit[0] + 1) % F.P
    proof.commit_phase_commits[0] = tuple(bad_commit)
    vch = fresh_challenger()
    vch.observe_many(data.root_std)
    with pytest.raises(FriError):
        pcs.verify(
            [(data.root_std, [(domains[0], [(z, opened[0][0][0])])])],
            proof,
            vch,
        )


def test_pcs_high_arity_round_trip(rng):
    params = FriParameters(
        log_blowup=2,
        log_final_poly_len=0,
        max_log_arity=3,
        num_queries=3,
        commit_proof_of_work_bits=1,
        query_proof_of_work_bits=1,
    )
    pcs = make_pcs(params)
    z = E.rand_h(rng)
    evals_std, domains, data, opened, proof = commit_and_open(
        pcs, rng, [(7, 2), (5, 2)], [[z], [z]]
    )
    assert any(s.log_arity > 1 for s in proof.commit_phase_steps)
    vch = fresh_challenger()
    vch.observe_many(data.root_std)
    pcs.verify(
        [
            (
                data.root_std,
                [
                    (domains[0], [(z, opened[0][0][0])]),
                    (domains[1], [(z, opened[0][1][0])]),
                ],
            )
        ],
        proof,
        vch,
    )


def test_pcs_final_poly_len_round_trip(rng):
    params = FriParameters.new_testing(log_final_poly_len=2)
    pcs = make_pcs(params)
    z = E.rand_h(rng)
    evals_std, domains, data, opened, proof = commit_and_open(
        pcs, rng, [(6, 2)], [[z]]
    )
    assert len(proof.final_poly) == 4
    vch = fresh_challenger()
    vch.observe_many(data.root_std)
    pcs.verify(
        [(data.root_std, [(domains[0], [(z, opened[0][0][0])])])],
        proof,
        vch,
    )
