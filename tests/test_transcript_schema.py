"""Transcript schema enforcement (whir/src/fiat_shamir/
domain_separator.rs analog): the declared op sequence gates every
challenger call; drift raises SchemaViolation at the drift point."""

import numpy as np
import pytest

from plonky3_tpu.challenger.duplex import DuplexChallenger
from plonky3_tpu.challenger.schema import (
    SchemaChallenger,
    SchemaViolation,
    TranscriptSchema,
    whir_schema,
)
from plonky3_tpu.fields import KoalaBearExt4 as E
from plonky3_tpu.fields.params import KoalaBear as F
from plonky3_tpu.hashes.poseidon2 import default_poseidon2


def _ch():
    return DuplexChallenger(default_poseidon2(F, 24), rate=16)


def test_schema_pass_and_finish():
    s = TranscriptSchema("t").observe("a", 2).sample_ext("b").grind("c")
    ch = SchemaChallenger(_ch(), s)
    ch.observe(1)
    ch.observe(2)
    ch.sample_ext(4)
    ch.grind(0)
    ch.finish()


def test_schema_wrong_kind_raises():
    s = TranscriptSchema("t").observe("a").sample_ext("b")
    ch = SchemaChallenger(_ch(), s)
    ch.observe(1)
    with pytest.raises(SchemaViolation):
        ch.sample_bits(8)


def test_schema_overrun_and_underrun():
    s = TranscriptSchema("t").observe("a")
    ch = SchemaChallenger(_ch(), s)
    ch.observe(1)
    with pytest.raises(SchemaViolation):
        ch.observe(2)
    s2 = TranscriptSchema("t").observe("a", 2)
    ch2 = SchemaChallenger(_ch(), s2)
    ch2.observe(1)
    with pytest.raises(SchemaViolation):
        ch2.finish()


def test_whir_prove_verify_under_schema():
    """WHIR open/verify now run under the declared schema internally —
    a full round-trip plus a deliberately wrong schema (tamper)."""
    from plonky3_tpu.hashes.sponge import (
        PaddingFreeSponge,
        TruncatedPermutation,
    )
    from plonky3_tpu.merkle.extension_mmcs import ExtensionMmcs
    from plonky3_tpu.merkle.mmcs import MerkleTreeMmcs
    from plonky3_tpu.multilinear.whir import WhirConfig, WhirPcs

    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
    )
    cfg = WhirConfig(
        log_blowup=1, folding_factor=2, final_vars=2,
        num_queries=4, ood_samples=1, pow_bits=0,
    )
    pcs = WhirPcs(F=F, E=E, config=cfg, mmcs=mmcs,
                  fri_mmcs=ExtensionMmcs(inner=mmcs, D=E.D))
    rng = np.random.default_rng(3)
    n_vars = 6
    evals = rng.integers(0, F.P, 1 << n_vars, dtype=np.uint64).astype(
        np.uint32
    )
    commit, data = pcs.commit(evals)
    point = [tuple(int(x) for x in F.rand_np(rng, (E.D,)))
             for _ in range(n_vars)]

    ch = _ch()
    value, proof = pcs.open(data, point, ch)
    ch2 = _ch()
    pcs.verify(commit, n_vars, point, value, proof, ch2)

    # tamper: running the verifier under a WRONG schema must raise at
    # the eq-drift point, not silently verify
    bad = whir_schema(cfg, n_vars)
    bad.ops = bad.ops[1:]  # drop the first declared op
    ch3 = SchemaChallenger(_ch(), bad)
    with pytest.raises(SchemaViolation):
        pcs.verify(commit, n_vars, point, value, proof, ch3)


def test_multi_stark_schema_roundtrip():
    from plonky3_tpu.hashes.sponge import (
        PaddingFreeSponge,
        TruncatedPermutation,
    )
    from plonky3_tpu.merkle.extension_mmcs import ExtensionMmcs
    from plonky3_tpu.merkle.mmcs import MerkleTreeMmcs
    from plonky3_tpu.models.fibonacci import (
        FibonacciAir,
        generate_fibonacci_trace,
    )
    from plonky3_tpu.multilinear.multi_stark import (
        prove_multi_stark,
        verify_multi_stark,
    )
    from plonky3_tpu.multilinear.whir import WhirConfig, WhirPcs

    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
    )
    cfg = WhirConfig(
        log_blowup=1, folding_factor=2, final_vars=2,
        num_queries=4, ood_samples=1, pow_bits=0,
    )
    pcs = WhirPcs(F=F, E=E, config=cfg, mmcs=mmcs,
                  fri_mmcs=ExtensionMmcs(inner=mmcs, D=E.D))
    air = FibonacciAir(F)
    rows, publics = generate_fibonacci_trace(F, 5)
    proof = prove_multi_stark(pcs, air, rows, publics, _ch())
    verify_multi_stark(pcs, air, proof, publics, _ch())
