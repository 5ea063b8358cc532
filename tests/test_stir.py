"""STIR low-degree test: round-trips + tamper rejection
(model: stir/src/prover.rs tests / verifier.rs tests)."""

import numpy as np
import pytest

from plonky3_tpu.challenger.duplex import DuplexChallenger
from plonky3_tpu.fields import KoalaBear as F, KoalaBearExt4 as E
from plonky3_tpu.hashes.poseidon2 import default_poseidon2
from plonky3_tpu.hashes.sponge import PaddingFreeSponge, TruncatedPermutation
from plonky3_tpu.merkle.extension_mmcs import ExtensionMmcs
from plonky3_tpu.merkle.mmcs import MerkleTreeMmcs
from plonky3_tpu.stir import (
    StirConfig,
    StirParameters,
    StirError,
    prove_stir,
    verify_stir,
)


def make_mmcs():
    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
    )
    return ExtensionMmcs(inner=mmcs, D=E.D)


def challenger():
    return DuplexChallenger(default_poseidon2(F, 24), rate=16)


def make_config(log_degree, log_blowup=2, lff=2, security=60,
                max_pow=12):
    params = StirParameters(
        log_blowup=log_blowup,
        log_folding_factor=lff,
        security_level=security,
        max_pow_bits=max_pow,
    )
    return StirConfig.new(F, E, make_mmcs(), log_degree, params)


def coeffs_to_monty(std):
    return F.to_monty_np(std.astype(np.uint64).astype(np.uint32))


def random_poly(log_degree, seed=0):
    rng = np.random.default_rng(seed)
    coeffs = np.stack(
        [F.rand_np(rng, (1 << log_degree,)) for _ in range(E.D)], axis=-1
    )
    return coeffs_to_monty(coeffs)


@pytest.mark.parametrize("log_degree,lff", [(6, 2), (8, 2), (9, 3)])
def test_stir_roundtrip(log_degree, lff):
    config = make_config(log_degree, lff=lff)
    coeffs = random_poly(log_degree, seed=log_degree)
    proof, _hint = prove_stir(config, coeffs, challenger())
    verify_stir(config, proof, challenger())  # must not raise


def test_stir_multi_round():
    """Degree 2^8 with k=4 gives two folds => one intermediate round."""
    config = make_config(8, lff=2)
    assert config.num_rounds >= 1
    coeffs = random_poly(8, seed=1)
    proof, _ = prove_stir(config, coeffs, challenger())
    verify_stir(config, proof, challenger())


def test_stir_rejects_tampered_final_poly():
    config = make_config(6)
    proof, _ = prove_stir(config, random_poly(6, 2), challenger())
    c0 = proof.final_polynomial[0]
    proof.final_polynomial[0] = tuple((x + 1) % F.P for x in c0)
    with pytest.raises(StirError):
        verify_stir(config, proof, challenger())


def test_stir_rejects_tampered_commitment():
    config = make_config(8)
    proof, _ = prove_stir(config, random_poly(8, 3), challenger())
    rp = proof.round_proofs[0]
    rp.commitment = tuple((x + 1) % F.P for x in rp.commitment)
    with pytest.raises(StirError):
        verify_stir(config, proof, challenger())


def test_stir_rejects_tampered_query_row():
    config = make_config(8)
    proof, _ = prove_stir(config, random_poly(8, 4), challenger())
    rp = proof.round_proofs[0]
    if rp.query_openings is not None:
        row = rp.query_openings.row_evals[0]
        row[0] = tuple((x + 1) % F.P for x in row[0])
        with pytest.raises(StirError):
            verify_stir(config, proof, challenger())


def test_stir_rejects_tampered_ood_answer():
    config = make_config(8)
    proof, _ = prove_stir(config, random_poly(8, 5), challenger())
    rp = proof.round_proofs[0]
    y = rp.ood_answers[0]
    rp.ood_answers[0] = tuple((x + 1) % F.P for x in y)
    with pytest.raises(StirError):
        verify_stir(config, proof, challenger())


def test_stir_rejects_wrong_degree():
    """A codeword of too-high degree must fail verification."""
    from plonky3_tpu.stir.prover import prove_stir_from_codeword

    config = make_config(6)
    rng = np.random.default_rng(9)
    # random evaluations = (whp) max-degree polynomial
    N = 1 << config.log_starting_domain_size
    cw = coeffs_to_monty(
        np.stack([F.rand_np(rng, (N,)) for _ in range(E.D)], axis=-1)
    )
    proof, _ = prove_stir_from_codeword(config, cw, challenger())
    with pytest.raises(StirError):
        verify_stir(config, proof, challenger())
