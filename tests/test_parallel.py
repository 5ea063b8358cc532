"""Multi-chip sharding layer on the 8-device CPU mesh: the sharded LDE
and sharded Merkle tree must be BIT-IDENTICAL to the single-device path
(SURVEY.md §4 multi-host test strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plonky3_tpu.fields.params import KoalaBear as F
from plonky3_tpu.hashes.poseidon2 import default_poseidon2
from plonky3_tpu.hashes.sponge import PaddingFreeSponge, TruncatedPermutation
from plonky3_tpu.merkle.mmcs import MerkleTreeMmcs
from plonky3_tpu.ops.ntt import coset_lde_batch
from plonky3_tpu.parallel.merkle import sharded_tree_layers
from plonky3_tpu.parallel.ntt import coset_lde_batch_sharded


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("sp",))


def test_sharded_lde_bit_identical(mesh, rng):
    mat = jnp.asarray(F.rand_np(rng, (256, 5)))
    ref = np.asarray(coset_lde_batch(F, mat, 1, F.GENERATOR))
    sharded_in = jax.device_put(
        mat, NamedSharding(mesh, P("sp", None))
    )
    out = coset_lde_batch_sharded(F, sharded_in, 1, F.GENERATOR, mesh)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_sharded_merkle_bit_identical(mesh, rng):
    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
    )
    mat = jnp.asarray(F.rand_np(rng, (128, 9)))
    ref = mmcs.commit([mat])
    sharded = jax.device_put(mat, NamedSharding(mesh, P("sp", None)))
    layers = sharded_tree_layers(mmcs, sharded, mesh)
    root = tuple(
        int(x) for x in F.from_monty_np(np.asarray(layers[-1][0]))
    )
    assert root == ref.root_std
    for got, want in zip(layers, ref.layers):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_full_prove_sharded_bit_identical(mesh, rng):
    """VERDICT r1 #10: the WHOLE prover (commit + quotient + FRI commit
    phase + query phase) under the mesh, proof bit-identical to
    single-chip. The host transcript is replicated; every device kernel
    runs SPMD via GSPMD propagation from the sharded trace."""
    import dataclasses
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from plonky3_tpu.fields import KoalaBear as F, KoalaBearExt4 as E
    from plonky3_tpu.fri.config import FriParameters
    from plonky3_tpu.models.fibonacci import (
        FibonacciAir,
        generate_fibonacci_trace,
    )
    from plonky3_tpu.stark.config import poseidon2_stark_config
    from plonky3_tpu.stark.prover import prove
    from plonky3_tpu.stark.verifier import verify
    config = poseidon2_stark_config(F, E, FriParameters.new_testing())
    air = FibonacciAir(F)
    rows, publics = generate_fibonacci_trace(F, 6)
    trace_host = F.to_monty_np(rows)

    trace_single = jnp.asarray(trace_host)
    proof_single = prove(config, air, trace_single, publics)

    sharding = NamedSharding(mesh, P("sp", None))
    trace_sharded = jax.device_put(trace_host, sharding)
    proof_sharded = prove(config, air, trace_sharded, publics)

    verify(config, air, proof_sharded, publics)
    assert proof_single.commitments == proof_sharded.commitments
    assert proof_single.opened_values == proof_sharded.opened_values
    import dataclasses as _dc

    def flat(x):
        if _dc.is_dataclass(x):
            return {k: flat(v) for k, v in vars(x).items()}
        if isinstance(x, (list, tuple)):
            return [flat(v) for v in x]
        return x

    assert flat(proof_single.opening_proof) == flat(
        proof_sharded.opening_proof
    )


def _commit_step_hlo(mesh, shape):
    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
    )
    row_sharding = NamedSharding(mesh, P("sp", None))

    def commit_step(trace):
        lde = coset_lde_batch_sharded(F, trace, 1, F.GENERATOR, mesh)
        layers = sharded_tree_layers(mmcs, lde, mesh)
        return layers[-1][0]

    big = jax.ShapeDtypeStruct(shape, jnp.uint32, sharding=row_sharding)
    return (
        jax.jit(commit_step, in_shardings=(row_sharding,))
        .lower(big)
        .compile()
        .as_text()
    )


def test_hlo_contains_expected_collectives(mesh):
    """The compiled sharded commit pipeline must contain the NTT
    phase-exchange all-to-all and a cap-gather collective — pins GSPMD
    against silently serializing the program (VERDICT r2 #7)."""
    hlo = _commit_step_hlo(mesh, (1 << 10, 64))
    assert "all-to-all" in hlo
    assert any(
        op in hlo
        for op in ("all-gather", "collective-permute", "all-reduce")
    )


@pytest.mark.slow
def test_hlo_collectives_at_benchmark_shape(mesh):
    """Same assertion at the real benchmark shape (2^14 rows x 1312 —
    the Poseidon2 vector AIR width), compile-only."""
    hlo = _commit_step_hlo(mesh, (1 << 14, 1312))
    assert "all-to-all" in hlo
    assert any(
        op in hlo
        for op in ("all-gather", "collective-permute", "all-reduce")
    )


def test_prove_fast_sharded_bit_identical(mesh, rng):
    """The device-FS single-dispatch prover under the mesh (round-3
    VERDICT next #6): one jitted program, trace row-sharded over 'sp',
    proof bit-identical to the single-device fast path."""
    import dataclasses as _dc

    from plonky3_tpu.fields import KoalaBearExt4 as E
    from plonky3_tpu.fri.config import FriParameters
    from plonky3_tpu.models.fibonacci import (
        FibonacciAir,
        generate_fibonacci_trace,
    )
    from plonky3_tpu.stark.config import keccak_stark_config
    from plonky3_tpu.stark.fast_prover import _prove_device_fs
    from plonky3_tpu.stark.verifier import verify

    params = FriParameters(
        log_blowup=1, log_final_poly_len=0, max_log_arity=3,
        num_queries=6, commit_proof_of_work_bits=0,
        query_proof_of_work_bits=6,
    )
    config = keccak_stark_config(F, E, params)
    air = FibonacciAir(F)
    rows, publics = generate_fibonacci_trace(F, 7)
    trace_host = F.to_monty_np(rows)

    proof_single = _prove_device_fs(
        config, air, jnp.asarray(trace_host), publics
    )
    sharding = NamedSharding(mesh, P("sp", None))
    trace_sharded = jax.device_put(trace_host, sharding)
    proof_sharded = _prove_device_fs(config, air, trace_sharded, publics)

    verify(config, air, proof_sharded, publics)

    def flat(x):
        if _dc.is_dataclass(x):
            return {k: flat(v) for k, v in vars(x).items()}
        if isinstance(x, (list, tuple)):
            return [flat(v) for v in x]
        return x

    assert flat(proof_single) == flat(proof_sharded)
