"""WHIR multilinear PCS: round-trips + tamper rejection
(model: whir/src/pcs tests + multi-stark/tests/whir_*.rs)."""

import numpy as np
import pytest

from plonky3_tpu.fields import KoalaBear as F, KoalaBearExt4 as E
from plonky3_tpu.fri.config import FriParameters
from plonky3_tpu.hashes.poseidon2 import default_poseidon2
from plonky3_tpu.hashes.sponge import PaddingFreeSponge, TruncatedPermutation
from plonky3_tpu.merkle.extension_mmcs import ExtensionMmcs
from plonky3_tpu.merkle.mmcs import MerkleTreeMmcs
from plonky3_tpu.multilinear.whir import (
    WhirConfig,
    WhirError,
    WhirPcs,
    eval_multilinear_coeffs,
    evals_to_coeffs_np,
)
from plonky3_tpu.challenger.duplex import DuplexChallenger


def make_pcs(cfg):
    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
    )
    return WhirPcs(
        F=F, E=E, config=cfg, mmcs=mmcs,
        fri_mmcs=ExtensionMmcs(inner=mmcs, D=E.D),
    )


def challenger():
    return DuplexChallenger(default_poseidon2(F, 24), rate=16)


def run_roundtrip(n_vars, cfg, seed=0, tamper=None):
    pcs = make_pcs(cfg)
    rng = np.random.default_rng(seed)
    evals = F.rand_np(rng, (1 << n_vars,), monty=False)
    commit, data = pcs.commit(evals)

    rng2 = np.random.default_rng(seed + 1)
    point = [
        tuple(int(x) for x in F.rand_np(rng2, (E.D,), monty=False))
        for _ in range(n_vars)
    ]

    ch = challenger()
    ch.observe_digest(commit)
    for p in point:
        ch.observe_ext(p)
    value, proof = pcs.open(data, point, ch)

    # independent check of the claimed value
    coeffs = [E.from_base_h(int(c)) for c in evals_to_coeffs_np(F, evals)]
    assert value == eval_multilinear_coeffs(E, coeffs, point)

    if tamper:
        tamper(proof)

    chv = challenger()
    chv.observe_digest(commit)
    for p in point:
        chv.observe_ext(p)
    pcs.verify(commit, n_vars, point, value, proof, chv)


@pytest.mark.parametrize(
    "n_vars,k,final", [(6, 2, 2), (8, 2, 2), (9, 3, 3)]
)
def test_whir_roundtrip(n_vars, k, final):
    cfg = WhirConfig(
        log_blowup=2, folding_factor=k, final_vars=final,
        num_queries=8, ood_samples=1, pow_bits=2,
    )
    run_roundtrip(n_vars, cfg)


def test_whir_rejects_tampered_final_poly():
    cfg = WhirConfig(
        log_blowup=2, folding_factor=2, final_vars=2,
        num_queries=8, ood_samples=1, pow_bits=2,
    )

    def tamper(proof):
        fp = list(proof.final_poly)
        fp[0] = tuple((c + 1) % F.P for c in fp[0])
        proof.final_poly = fp

    with pytest.raises(WhirError):
        run_roundtrip(6, cfg, tamper=tamper)


def test_whir_rejects_tampered_ood():
    cfg = WhirConfig(
        log_blowup=2, folding_factor=2, final_vars=2,
        num_queries=8, ood_samples=1, pow_bits=2,
    )

    def tamper(proof):
        ov = list(proof.rounds[0].ood_values)
        ov[0] = tuple((c + 1) % F.P for c in ov[0])
        proof.rounds[0].ood_values = ov

    with pytest.raises(WhirError):
        run_roundtrip(8, cfg, tamper=tamper)


def test_whir_rejects_tampered_query_values():
    cfg = WhirConfig(
        log_blowup=2, folding_factor=2, final_vars=2,
        num_queries=8, ood_samples=1, pow_bits=2,
    )

    def tamper(proof):
        g = list(proof.rounds[0].query_values[0])
        g[0] = tuple((c + 1) % F.P for c in g[0])
        proof.rounds[0].query_values[0] = g

    with pytest.raises(WhirError):
        run_roundtrip(8, cfg, tamper=tamper)


def test_whir_rejects_wrong_value():
    cfg = WhirConfig(
        log_blowup=2, folding_factor=2, final_vars=2,
        num_queries=8, ood_samples=1, pow_bits=2,
    )
    pcs = make_pcs(cfg)
    rng = np.random.default_rng(5)
    evals = F.rand_np(rng, (1 << 6,), monty=False)
    commit, data = pcs.commit(evals)
    point = [E.from_base_h(i + 3) for i in range(6)]
    ch = challenger()
    value, proof = pcs.open(data, point, ch)
    bad = tuple((c + 1) % F.P for c in value)
    with pytest.raises(WhirError):
        pcs.verify(commit, 6, point, bad, proof, challenger())


def test_whir_from_security_roundtrip():
    """Security-derived per-round schedule (queries/OOD/PoW from a
    SecurityAssumption) proves and verifies; schedule is non-trivial."""
    from plonky3_tpu.multilinear.whir import WhirConfig

    n_vars = 6
    field_bits = 4 * 31  # KoalaBear quartic extension
    cfg = WhirConfig.from_security(
        60, "johnson", n_vars, field_bits,
        log_blowup=2, folding_factor=2, final_vars=2, max_pow_bits=8,
    )
    assert cfg.round_queries is not None
    assert len(cfg.round_queries) == cfg.num_rounds(n_vars) + 1
    # queries shrink as the rate improves round over round
    assert cfg.round_queries[0] >= cfg.round_queries[-1]
    rep = cfg.soundness_report(n_vars, field_bits)
    assert rep["conjectured_bits"] >= 55  # ~security_bits, pow included

    pcs = make_pcs(cfg)
    rng = np.random.default_rng(5)
    evals = F.rand_np(rng, (1 << n_vars,), monty=False)
    commit, data = pcs.commit(evals)
    point = [tuple(int(v) for v in F.rand_np(rng, (E.D,), monty=False))
             for _ in range(n_vars)]
    value, proof = pcs.open(data, point, challenger())
    pcs.verify(commit, n_vars, point, value, proof, challenger())
