"""ZK multilinear stack: zk-codes encodings, hiding WHIR, masked
zerocheck (reference: zk-codes/, whir/src/pcs/zk/, sumcheck/src/zk/)."""

import numpy as np
import pytest

from plonky3_tpu.challenger.duplex import DuplexChallenger
from plonky3_tpu.fields import KoalaBear as F, KoalaBearExt4 as E
from plonky3_tpu.hashes.poseidon2 import default_poseidon2
from plonky3_tpu.hashes.sponge import PaddingFreeSponge, TruncatedPermutation
from plonky3_tpu.merkle.extension_mmcs import ExtensionMmcs
from plonky3_tpu.merkle.mmcs import MerkleTreeMmcs
from plonky3_tpu.multilinear.hiding_whir import HidingWhirPcs
from plonky3_tpu.multilinear.whir import WhirConfig, WhirError
from plonky3_tpu.multilinear.zk_codes import ReedSolomonZkEncoding


def challenger():
    return DuplexChallenger(default_poseidon2(F, 24), rate=16)


def make_hiding_pcs(n1_vars):
    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
    )
    k = 2
    final = n1_vars % k if n1_vars % k else k
    cfg = WhirConfig(
        log_blowup=2, folding_factor=k, final_vars=final,
        num_queries=8, ood_samples=1, pow_bits=2,
    )
    return HidingWhirPcs(F=F, E=E, config=cfg, mmcs=mmcs,
                         fri_mmcs=ExtensionMmcs(inner=mmcs, D=E.D))


# ---------------------------------------------------------------------------
# zk-codes component
# ---------------------------------------------------------------------------
def test_zk_rs_encoding_linearity_and_message_recovery():
    rng = np.random.default_rng(0)
    enc = ReedSolomonZkEncoding(F=F, t=4, msg_len=8, log_m=5)
    msg = F.rand_np(rng, (8,), monty=False)
    r = enc.sample_randomness(rng)
    cw = enc.encode_with_randomness(msg, r)
    assert cw.shape == (32,)
    # linearity: encode(a) + encode(b) == encode(a + b) (randomness adds)
    msg2 = F.rand_np(rng, (8,), monty=False)
    r2 = enc.sample_randomness(rng)
    cw2 = enc.encode_with_randomness(msg2, r2)
    s_msg = ((msg.astype(np.uint64) + msg2) % F.P).astype(np.uint32)
    s_r = ((r.astype(np.uint64) + r2) % F.P).astype(np.uint32)
    cw_sum = enc.encode_with_randomness(s_msg, s_r)
    assert (((cw.astype(np.uint64) + cw2) % F.P) == cw_sum).all()


def test_zk_rs_single_position_uniform():
    """One codeword position of a FIXED message is uniform over the
    encoding randomness (the t-query perfect simulation property)."""
    rng = np.random.default_rng(1)
    enc = ReedSolomonZkEncoding(F=F, t=1, msg_len=4, log_m=3)
    msg = np.zeros(4, np.uint32)  # worst case: all-zero message
    pos_vals = set()
    for _ in range(64):
        cw = enc.encode(msg, rng)
        pos_vals.add(int(cw[5]))
    # 64 draws of a uniform field element collide with negligible prob
    assert len(pos_vals) >= 60


def test_zk_rs_simulate_budget():
    rng = np.random.default_rng(2)
    enc = ReedSolomonZkEncoding(F=F, t=3, msg_len=4, log_m=4)
    vals = enc.simulate([1, 5, 1, 9], rng)  # 3 distinct positions
    assert vals[0] == vals[2]  # duplicates agree
    with pytest.raises(AssertionError):
        enc.simulate([0, 1, 2, 3], rng)  # 4 distinct > budget


# ---------------------------------------------------------------------------
# hiding WHIR
# ---------------------------------------------------------------------------
def _commit_open(n_vars, seed, evals=None):
    rng = np.random.default_rng(seed)
    pcs = make_hiding_pcs(n_vars + 1)
    if evals is None:
        evals = F.rand_np(rng, (1 << n_vars,), monty=False)
    commit, data = pcs.commit_hiding(evals, rng)
    point = [tuple(int(v) for v in F.rand_np(rng, (E.D,), monty=False))
             for _ in range(n_vars)]
    ch = challenger()
    value, proof = pcs.open_hiding(data, point, ch, rng)
    return pcs, evals, commit, point, value, proof


def test_hiding_whir_roundtrip():
    n_vars = 6
    pcs, evals, commit, point, value, proof = _commit_open(n_vars, 3)
    # value is the true MLE evaluation of the WITNESS alone
    from plonky3_tpu.multilinear.mle import eval_mle_host

    assert value == eval_mle_host(E, [int(v) for v in evals], point)
    pcs.verify_hiding(commit, n_vars, point, value, proof, challenger())


def test_hiding_whir_tamper_rejected():
    n_vars = 6
    pcs, _, commit, point, value, proof = _commit_open(n_vars, 4)
    bad = tuple((c + 1) % F.P for c in value)
    with pytest.raises(WhirError):
        pcs.verify_hiding(commit, n_vars, point, bad, proof, challenger())
    vm = proof.v_mask
    proof.v_mask = tuple((c + 1) % F.P for c in vm)
    with pytest.raises(WhirError):
        pcs.verify_hiding(
            commit, n_vars, point, value, proof, challenger()
        )
    proof.v_mask = vm
    pcs.verify_hiding(commit, n_vars, point, value, proof, challenger())


def test_hiding_whir_leakage():
    """HVZK smoke test: two openings of the SAME witness at the same
    point share nothing beyond the claimed value — every mask value,
    commitment and final polynomial differs (one-time masks), and the
    same witness under fresh commitment randomness yields different
    codeword commitments."""
    n_vars = 6
    rng = np.random.default_rng(7)
    evals = F.rand_np(rng, (1 << n_vars,), monty=False)
    pcs1, _, commit1, point, value1, proof1 = _commit_open(
        n_vars, 8, evals=evals
    )
    pcs2, _, commit2, _, value2, proof2 = _commit_open(
        n_vars, 9, evals=evals
    )
    assert commit1 != commit2  # fresh zk-codes randomness
    assert proof1.mask_commit != proof2.mask_commit
    assert proof1.v_mask != proof2.v_mask
    assert proof1.inner.final_poly != proof2.inner.final_poly
    # the h-transcript wires differ round by round (one-time masks)
    for r1, r2 in zip(proof1.inner.rounds, proof2.inner.rounds):
        assert r1.sumcheck_polys != r2.sumcheck_polys


# ---------------------------------------------------------------------------
# masked (HVZK) zerocheck
# ---------------------------------------------------------------------------
def _mask_pcs_for(air_vars):
    from plonky3_tpu.multilinear.zk_sumcheck import _mask_layout

    _, _, _, flat_len = _mask_layout(E, air_vars, 4)
    n1 = flat_len.bit_length() - 1 + 1  # committed vars (with zk var)
    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
    )
    k = 2
    final = n1 % k if n1 % k else k
    cfg = WhirConfig(
        log_blowup=2, folding_factor=k, final_vars=final,
        num_queries=6, ood_samples=1, pow_bits=1,
    )
    return HidingWhirPcs(F=F, E=E, config=cfg, mmcs=mmcs,
                         fri_mmcs=ExtensionMmcs(inner=mmcs, D=E.D))


def test_masked_zerocheck_roundtrip_and_tamper():
    from plonky3_tpu.models.fibonacci import (
        FibonacciAir, generate_fibonacci_trace,
    )
    from plonky3_tpu.multilinear.zk_sumcheck import (
        prove_masked_zerocheck, verify_masked_zerocheck,
    )

    log_n = 4
    trace, publics = generate_fibonacci_trace(F, log_n)
    air = FibonacciAir(F)
    pcs = _mask_pcs_for(log_n)
    rng = np.random.default_rng(11)
    proof = prove_masked_zerocheck(
        E, air, trace.astype(np.uint64), publics, challenger(), pcs, rng
    )
    verify_masked_zerocheck(
        E, air, log_n, publics, proof, challenger(), pcs
    )
    # tampered wire
    bad = [list(r) for r in proof.rounds]
    bad[0][0] = tuple((c + 1) % F.P for c in bad[0][0])
    good_rounds = proof.rounds
    proof.rounds = bad
    with pytest.raises((ValueError, WhirError)):
        verify_masked_zerocheck(
            E, air, log_n, publics, proof, challenger(), pcs
        )
    proof.rounds = good_rounds
    # tampered mask value must be caught by the hiding opening
    mv = [list(c) for c in proof.mask_values]
    mv[0][0] = tuple((c + 1) % F.P for c in mv[0][0])
    good_mv = proof.mask_values
    proof.mask_values = mv
    with pytest.raises((ValueError, WhirError)):
        verify_masked_zerocheck(
            E, air, log_n, publics, proof, challenger(), pcs
        )
    proof.mask_values = good_mv


def test_masked_zerocheck_wires_hide_the_trace():
    """Two proofs of the SAME statement have entirely different wires
    (one-time masks): nothing about the trace leaks through them."""
    from plonky3_tpu.models.fibonacci import (
        FibonacciAir, generate_fibonacci_trace,
    )
    from plonky3_tpu.multilinear.zk_sumcheck import prove_masked_zerocheck

    log_n = 4
    trace, publics = generate_fibonacci_trace(F, log_n)
    air = FibonacciAir(F)
    pcs = _mask_pcs_for(log_n)
    p1 = prove_masked_zerocheck(
        E, air, trace.astype(np.uint64), publics, challenger(),
        pcs, np.random.default_rng(21),
    )
    p2 = prove_masked_zerocheck(
        E, air, trace.astype(np.uint64), publics, challenger(),
        pcs, np.random.default_rng(22),
    )
    assert p1.mu != p2.mu
    for r1, r2 in zip(p1.rounds, p2.rounds):
        assert all(a != b for a, b in zip(r1, r2))
    assert p1.mask_values != p2.mask_values
