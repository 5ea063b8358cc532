"""CirclePcs end-to-end: commit/open/verify round-trip + tamper rejection.

Mirrors `circle/src/pcs.rs` tests (circle_pcs round-trip, structural
tamper tests :1372-1408).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from plonky3_tpu.challenger.serializing import SerializingChallenger32
from plonky3_tpu.circle_pcs import CirclePcs
from plonky3_tpu.fields.mersenne31 import Mersenne31 as F
from plonky3_tpu.fields.qm31 import QM31 as E
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.fri.verifier import FriError
from plonky3_tpu.hashes.keccak_sponge import (
    KeccakCompressor,
    KeccakFieldSponge,
)
from plonky3_tpu.merkle.extension_mmcs import ExtensionMmcs
from plonky3_tpu.merkle.mmcs import MerkleTreeMmcs


@pytest.fixture(scope="module")
def pcs():
    mmcs = MerkleTreeMmcs(
        sponge=KeccakFieldSponge(F), compressor=KeccakCompressor()
    )
    return CirclePcs(
        fri=FriParameters.new_testing(),
        mmcs=mmcs,
        fri_mmcs=ExtensionMmcs(inner=mmcs, D=4),
    )


def test_evaluations_on_own_domain(pcs, rng):
    domain = pcs.natural_domain_for_degree(16)
    evals = jnp.asarray(F.rand_np(rng, (16, 3)))
    data = pcs.commit([(domain, evals)])
    got = pcs.get_evaluations_on_domain(data, 0, domain)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(evals))


def _roundtrip(pcs, rng, shapes):
    datas = []
    all_domains = []
    for (log_n, w) in shapes:
        domain = pcs.natural_domain_for_degree(1 << log_n)
        evals = jnp.asarray(F.rand_np(rng, (1 << log_n, w)))
        datas.append((domain, evals))
        all_domains.append(domain)
    data = pcs.commit(datas)

    ch = SerializingChallenger32(F)
    ch.observe_digest(data.root_std)
    zeta = ch.sample_ext(4)
    opened, proof = pcs.open([(data, [[zeta]] * len(shapes))], ch)

    vch = SerializingChallenger32(F)
    vch.observe_digest(data.root_std)
    zeta_v = vch.sample_ext(4)
    assert zeta_v == zeta
    rounds = [
        (
            data.root_std,
            [
                (dom, [(zeta, opened[0][i][0])])
                for i, dom in enumerate(all_domains)
            ],
        )
    ]
    pcs.verify(rounds, proof, vch)
    return data, opened, proof, zeta, all_domains


def test_single_matrix_roundtrip(pcs, rng):
    _roundtrip(pcs, rng, [(5, 3)])


def test_mixed_heights_roundtrip(pcs, rng):
    _roundtrip(pcs, rng, [(6, 2), (4, 5)])


def test_tampered_value_rejected(pcs, rng):
    data, opened, proof, zeta, domains = _roundtrip(pcs, rng, [(5, 3)])
    bad = list(opened[0][0][0])
    bad[0] = E.add_h(bad[0], E.one_h())
    vch = SerializingChallenger32(F)
    vch.observe_digest(data.root_std)
    vch.sample_ext(4)
    rounds = [(data.root_std, [(domains[0], [(zeta, bad)])])]
    with pytest.raises(FriError):
        pcs.verify(rounds, proof, vch)


def test_tampered_lambda_rejected(pcs, rng):
    data, opened, proof, zeta, domains = _roundtrip(pcs, rng, [(5, 3)])
    proof.lambdas[0] = E.add_h(proof.lambdas[0], E.one_h())
    vch = SerializingChallenger32(F)
    vch.observe_digest(data.root_std)
    vch.sample_ext(4)
    rounds = [(data.root_std, [(domains[0], [(zeta, opened[0][0][0])])])]
    with pytest.raises(FriError):
        pcs.verify(rounds, proof, vch)
