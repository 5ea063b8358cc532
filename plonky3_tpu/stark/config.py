"""StarkConfig (uni-stark/src/config.rs:24,49): pcs + challenger factory."""

from __future__ import annotations

from dataclasses import dataclass

from ..challenger.duplex import DuplexChallenger
from ..fri.config import FriParameters
from ..fri.two_adic_pcs import TwoAdicFriPcs
from ..hashes.poseidon2 import default_poseidon2
from ..hashes.sponge import PaddingFreeSponge, TruncatedPermutation
from ..merkle.extension_mmcs import ExtensionMmcs
from ..merkle.mmcs import MerkleTreeMmcs


@dataclass(frozen=True)
class StarkConfig:
    pcs: TwoAdicFriPcs
    challenger_kind: str = "duplex"  # "duplex" | "keccak"
    challenger_factory: object = None  # optional () -> challenger override

    @property
    def F(self):
        return self.pcs.F

    @property
    def E(self):
        return self.pcs.E

    def initialise_challenger(self):
        if self.challenger_factory is not None:
            return self.challenger_factory()
        if self.challenger_kind == "keccak":
            from ..challenger.serializing import SerializingChallenger32

            return SerializingChallenger32(self.F)
        return DuplexChallenger(default_poseidon2(self.F, 24), rate=16)


def poseidon2_stark_config(F, E, fri_params: FriParameters,
                           cap_height: int = 0) -> StarkConfig:
    """The Poseidon2 merkle/challenger config of the reference benchmarks
    (examples/src/types.rs:44-62: sponge 24/16/8, compress 16 width,
    duplex 24/16; cap_height 3 in the example configs, proofs.rs:96)."""
    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
        cap_height=cap_height,
    )
    pcs = TwoAdicFriPcs(
        F=F, E=E, fri=fri_params, mmcs=mmcs,
        fri_mmcs=ExtensionMmcs(inner=mmcs, D=E.D),
    )
    return StarkConfig(pcs=pcs)


def zk_stark_config(F, E, fri_params: FriParameters, seed: int = 0,
                    salt_elems: int = 4,
                    num_random_codewords: int = 1) -> StarkConfig:
    """ZK configuration (fib_air.rs make_zk_config analog): hiding MMCS
    (salted leaves) + HidingFriPcs (random rows/codewords + masked
    quotient + R-poly batch randomizer)."""
    import numpy as np

    from ..fri.hiding_pcs import HidingFriPcs
    from ..merkle.hiding_mmcs import MerkleTreeHidingMmcs

    rng = np.random.default_rng(seed)
    base_mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
    )
    hiding = MerkleTreeHidingMmcs(
        inner=base_mmcs, salt_elems=salt_elems, rng=rng
    )
    inner = TwoAdicFriPcs(
        F=F, E=E, fri=fri_params, mmcs=hiding,
        fri_mmcs=ExtensionMmcs(inner=base_mmcs, D=E.D),
    )
    pcs = HidingFriPcs(
        inner=inner, num_random_codewords=num_random_codewords, rng=rng
    )
    return StarkConfig(pcs=pcs)


def circle_stark_config(fri_params: FriParameters) -> StarkConfig:
    """Mersenne-31 circle STARK config (the reference's m31 benchmark
    objective): CirclePcs + keccak merkle + SerializingChallenger32.

    fri_params must have max_log_arity == 1 and log_final_poly_len == 0
    (circle FRI restrictions, fri/src/config.rs:12)."""
    from ..circle_pcs import CirclePcs
    from ..fields.mersenne31 import Mersenne31
    from ..fields.qm31 import QM31
    from ..hashes.keccak_sponge import KeccakCompressor, KeccakFieldSponge

    assert fri_params.max_log_arity == 1
    assert fri_params.log_final_poly_len == 0
    mmcs = MerkleTreeMmcs(
        sponge=KeccakFieldSponge(Mersenne31), compressor=KeccakCompressor()
    )
    pcs = CirclePcs(
        fri=fri_params, mmcs=mmcs,
        fri_mmcs=ExtensionMmcs(inner=mmcs, D=QM31.D),
    )
    return StarkConfig(pcs=pcs, challenger_kind="keccak")


def keccak_stark_config(F, E, fri_params: FriParameters,
                        cap_height: int = 0) -> StarkConfig:
    """The KeccakF merkle/challenger config of the reference benchmarks
    (examples/src/types.rs:19-42: keccak sponge 25/17/4 over u64 lanes,
    SerializingChallenger32 over Keccak256) — the BASELINE.md canonical
    `--merkle-hash keccak-f` configuration."""
    from ..hashes.keccak_sponge import KeccakCompressor, KeccakFieldSponge

    mmcs = MerkleTreeMmcs(
        sponge=KeccakFieldSponge(F), compressor=KeccakCompressor(),
        cap_height=cap_height,
    )
    pcs = TwoAdicFriPcs(
        F=F, E=E, fri=fri_params, mmcs=mmcs,
        fri_mmcs=ExtensionMmcs(inner=mmcs, D=E.D),
    )
    return StarkConfig(pcs=pcs, challenger_kind="keccak")
