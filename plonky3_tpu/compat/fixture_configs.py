"""Reference golden-fixture STARK configs, reproduced exactly.

Mirrors `uni-stark/tests/fib_air.rs:118-153` (`make_two_adic_config`):
BabyBear, Poseidon2BabyBear<16> drawn from `SmallRng::seed_from_u64(1)`,
PaddingFreeSponge<Perm,16,8,8>, TruncatedPermutation<Perm,2,8,16>,
DuplexChallenger<BB,Perm,16,8>, FriParameters{log_blowup:2,
log_final_poly_len, max_log_arity:1, num_queries:2, commit_pow:1,
query_pow:1} — the config whose proofs are the golden fixtures
(`tests/fixtures/uni_stark_two_adic_v1.postcard`).
"""

from __future__ import annotations

from ..challenger.duplex import DuplexChallenger
from ..fields import BabyBear, BabyBearExt4
from ..fri.config import FriParameters
from ..fri.two_adic_pcs import TwoAdicFriPcs
from ..hashes.poseidon2 import Poseidon2
from ..hashes.sponge import PaddingFreeSponge, TruncatedPermutation
from ..merkle.extension_mmcs import ExtensionMmcs
from ..merkle.mmcs import MerkleTreeMmcs
from ..stark.config import StarkConfig
from .smallrng import poseidon2_constants_from_rng

FIXTURE_TWO_ADIC = (
    "/root/reference/uni-stark/tests/fixtures/uni_stark_two_adic_v1.postcard"
)
FIXTURE_CIRCLE = (
    "/root/reference/uni-stark/tests/fixtures/uni_stark_circle_v1.postcard"
)


def poseidon2_baby_bear_16(seed: int = 1) -> Poseidon2:
    """Poseidon2BabyBear<16> with rng-drawn constants (fib_air.rs:134-135)."""
    ei, ef, internal = poseidon2_constants_from_rng(
        BabyBear, 16, rounds_f=8, rounds_p=13, seed=seed
    )
    return Poseidon2(
        F=BabyBear,
        width=16,
        d=7,
        rc_external_initial=tuple(tuple(r) for r in ei),
        rc_external_final=tuple(tuple(r) for r in ef),
        rc_internal=tuple(internal),
    )


def two_adic_fixture_config(log_final_poly_len: int = 2) -> StarkConfig:
    F, E = BabyBear, BabyBearExt4
    perm = poseidon2_baby_bear_16()
    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(perm, rate=8, out=8),
        compressor=TruncatedPermutation(perm, chunk=8),
    )
    fri = FriParameters(
        log_blowup=2,
        log_final_poly_len=log_final_poly_len,
        max_log_arity=1,
        num_queries=2,
        commit_proof_of_work_bits=1,
        query_proof_of_work_bits=1,
    )
    pcs = TwoAdicFriPcs(
        F=F, E=E, fri=fri, mmcs=mmcs, fri_mmcs=ExtensionMmcs(inner=mmcs, D=E.D)
    )
    return StarkConfig(
        pcs=pcs,
        challenger_factory=lambda: DuplexChallenger(perm, rate=8),
    )


FIXTURE_BATCH_TWO_ADIC = (
    "/root/reference/batch-stark/tests/fixtures/"
    "batch_stark_two_adic_v1.postcard"
)
FIXTURE_BATCH_CIRCLE = (
    "/root/reference/batch-stark/tests/fixtures/"
    "batch_stark_circle_v1.postcard"
)


def batch_two_adic_fixture_config() -> StarkConfig:
    """make_two_adic_compat_config(777) (batch-stark/tests/simple.rs:580):
    Poseidon2BabyBear<16> from SmallRng(777), cap-height-1 Merkle,
    FRI {log_blowup:2, log_final_poly_len:2, max_log_arity:1,
    num_queries:2, commit_pow:1, query_pow:1}."""
    F, E = BabyBear, BabyBearExt4
    perm = poseidon2_baby_bear_16(777)
    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(perm, rate=8, out=8),
        compressor=TruncatedPermutation(perm, chunk=8),
        cap_height=1,
    )
    fri = FriParameters(
        log_blowup=2,
        log_final_poly_len=2,
        max_log_arity=1,
        num_queries=2,
        commit_proof_of_work_bits=1,
        query_proof_of_work_bits=1,
    )
    pcs = TwoAdicFriPcs(
        F=F, E=E, fri=fri, mmcs=mmcs,
        fri_mmcs=ExtensionMmcs(inner=mmcs, D=E.D),
    )
    return StarkConfig(
        pcs=pcs,
        challenger_factory=lambda: DuplexChallenger(perm, rate=8),
    )


def batch_circle_fixture_config():
    """make_circle_config (batch-stark/tests/simple.rs): M31 + cubic ext,
    Keccak256 byte digests, cap-height-3 Merkle, SerializingChallenger32,
    FRI {log_blowup:1, final:0, arity:1, queries:40, pow 8/8}."""
    from ..challenger.serializing import SerializingChallenger32
    from ..circle_pcs import CirclePcs
    from ..fields.mersenne31 import M31Ext3, Mersenne31
    from ..hashes.keccak256_mmcs import (
        Keccak256Compressor,
        Keccak256FieldHasher,
    )

    mmcs = MerkleTreeMmcs(
        sponge=Keccak256FieldHasher(Mersenne31),
        compressor=Keccak256Compressor(),
        cap_height=3,
    )
    fri = FriParameters(
        log_blowup=1,
        log_final_poly_len=0,
        max_log_arity=1,
        num_queries=40,
        commit_proof_of_work_bits=8,
        query_proof_of_work_bits=8,
    )
    pcs = CirclePcs(
        fri=fri,
        mmcs=mmcs,
        fri_mmcs=ExtensionMmcs(inner=mmcs, D=M31Ext3.D),
        ext=M31Ext3,
    )
    return StarkConfig(
        pcs=pcs,
        challenger_factory=lambda: SerializingChallenger32(
            Mersenne31, digest_bytes=True
        ),
    )


def circle_fixture_config():
    """The circle golden-fixture config (fib_air.rs:200-233):
    Mersenne31 + cubic extension, Keccak256 byte digests,
    SerializingChallenger32, FRI {log_blowup:1, final_poly_len:0,
    max_log_arity:1, num_queries:40, commit_pow:0, query_pow:8}."""
    from ..challenger.serializing import SerializingChallenger32
    from ..circle_pcs import CirclePcs
    from ..fields.mersenne31 import Mersenne31, M31Ext3
    from ..hashes.keccak256_mmcs import (
        Keccak256Compressor,
        Keccak256FieldHasher,
    )

    mmcs = MerkleTreeMmcs(
        sponge=Keccak256FieldHasher(Mersenne31),
        compressor=Keccak256Compressor(),
    )
    fri = FriParameters(
        log_blowup=1,
        log_final_poly_len=0,
        max_log_arity=1,
        num_queries=40,
        commit_proof_of_work_bits=0,
        query_proof_of_work_bits=8,
    )
    pcs = CirclePcs(
        fri=fri,
        mmcs=mmcs,
        fri_mmcs=ExtensionMmcs(inner=mmcs, D=M31Ext3.D),
        ext=M31Ext3,
    )
    return StarkConfig(
        pcs=pcs,
        challenger_factory=lambda: SerializingChallenger32(
            Mersenne31, digest_bytes=True
        ),
    )
