"""Production multi-stark over WHIR (multi-stark/src/prover.rs:59 model):
zerocheck + shift-reduction + column-binding + WHIR openings."""

import numpy as np
import pytest

from plonky3_tpu.challenger.duplex import DuplexChallenger
from plonky3_tpu.fields import KoalaBear as F, KoalaBearExt4 as E
from plonky3_tpu.hashes.poseidon2 import default_poseidon2
from plonky3_tpu.hashes.sponge import PaddingFreeSponge, TruncatedPermutation
from plonky3_tpu.merkle.extension_mmcs import ExtensionMmcs
from plonky3_tpu.merkle.mmcs import MerkleTreeMmcs
from plonky3_tpu.models.fibonacci import FibonacciAir, generate_fibonacci_trace
from plonky3_tpu.multilinear.multi_stark import (
    MultiStarkError,
    prove_multi_stark,
    verify_multi_stark,
    shift_kernel_at,
    shift_kernel_table,
)
from plonky3_tpu.multilinear.whir import WhirConfig, WhirError, WhirPcs


class CyclicFibAir(FibonacciAir):
    """Fibonacci transitions only (cyclic next-row; boundary constraints
    are not supported by the zerocheck-lite, multi-stark round-2 note)."""

    num_public_values = 0

    def eval(self, b):
        local, nxt = b.main.local, b.main.next
        trans = b.when_transition()
        trans.assert_eq(local[1], nxt[0])


def make_pcs(n_vars_total):
    mmcs = MerkleTreeMmcs(
        sponge=PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8),
        compressor=TruncatedPermutation(default_poseidon2(F, 16), chunk=8),
    )
    k = 2
    final = n_vars_total % k if n_vars_total % k else k
    cfg = WhirConfig(
        log_blowup=2, folding_factor=k, final_vars=final,
        num_queries=8, ood_samples=1, pow_bits=2,
    )
    return WhirPcs(F=F, E=E, config=cfg, mmcs=mmcs,
                   fri_mmcs=ExtensionMmcs(inner=mmcs, D=E.D))


def challenger():
    return DuplexChallenger(default_poseidon2(F, 24), rate=16)


def make_trace(log_n):
    # cyclic trace: col1 = roll(col0, -1) everywhere (wraps)
    n = 1 << log_n
    rng = np.random.default_rng(7)
    c0 = F.rand_np(rng, (n,), monty=False)
    c1 = np.roll(c0, -1)
    return np.stack([c0, c1], axis=1).astype(np.uint32)


def test_shift_kernel_consistency():
    rng = np.random.default_rng(1)
    n = 3
    x = [tuple(int(v) for v in F.rand_np(rng, (E.D,), monty=False))
         for _ in range(n)]
    table = shift_kernel_table(E, x, n)
    # MLE of the table at integer y equals indicator [y == x+1] when x int
    xi = [E.from_base_h(1), E.from_base_h(0), E.from_base_h(1)]  # x = 5
    t2 = shift_kernel_table(E, xi, n)
    for y in range(8):
        want = E.one_h() if y == 6 else E.zero_h()
        assert t2[y] == want, y
    # closed form matches the table's MLE at a random ext point
    y_pt = [tuple(int(v) for v in F.rand_np(rng, (E.D,), monty=False))
            for _ in range(n)]
    from plonky3_tpu.multilinear.whir import eq_table
    et = eq_table(E, y_pt)
    mle = E.zero_h()
    for y in range(8):
        mle = E.add_h(mle, E.mul_h(et[y], table[y]))
    assert shift_kernel_at(E, x, y_pt) == mle


def test_multi_stark_roundtrip():
    log_n = 4
    trace = make_trace(log_n)
    air = CyclicFibAir(F)
    pcs = make_pcs(log_n + 1)  # +1 column bit (w=2)
    proof = prove_multi_stark(pcs, air, trace, [], challenger())
    verify_multi_stark(pcs, air, proof, [], challenger())


def test_multi_stark_fibonacci_boundary():
    """Full FibonacciAir with first/last-row constraints AND boundary
    public values — the production path (selector MLEs + setup keys)."""
    from plonky3_tpu.multilinear.multi_stark import setup

    log_n = 4
    trace_std, publics = generate_fibonacci_trace(F, log_n)
    air = FibonacciAir(F)
    pcs = make_pcs(log_n + 1)
    pk, vk = setup(pcs, air)
    assert vk.max_ml_degree == 2  # selector(1) x linear(1)
    proof = prove_multi_stark(pcs, air, trace_std, publics, challenger(),
                              pk=pk)
    verify_multi_stark(pcs, air, proof, publics, challenger(), vk=vk)
    # wrong boundary public value must be rejected
    bad = list(publics)
    bad[2] = (bad[2] + 1) % F.P
    with pytest.raises((MultiStarkError, WhirError, ValueError)):
        verify_multi_stark(pcs, air, proof, bad, challenger(), vk=vk)


def test_multi_stark_fibonacci_bad_boundary_trace():
    """A trace violating only the FIRST-ROW constraint must be caught."""
    log_n = 4
    trace_std, publics = generate_fibonacci_trace(F, log_n)
    trace_std = trace_std.copy()
    trace_std[0, 0] = (int(trace_std[0, 0]) + 1) % F.P  # breaks first row
    air = FibonacciAir(F)
    pcs = make_pcs(log_n + 1)
    with pytest.raises((MultiStarkError, WhirError, ValueError)):
        proof = prove_multi_stark(pcs, air, trace_std, publics,
                                  challenger())
        verify_multi_stark(pcs, air, proof, publics, challenger())


def test_multi_stark_rejects_bad_trace():
    log_n = 4
    trace = make_trace(log_n)
    trace[3, 1] = (int(trace[3, 1]) + 1) % F.P
    air = CyclicFibAir(F)
    pcs = make_pcs(log_n + 1)
    with pytest.raises((MultiStarkError, WhirError, ValueError, AssertionError)):
        proof = prove_multi_stark(pcs, air, trace, [], challenger())
        verify_multi_stark(pcs, air, proof, [], challenger())


def test_multi_stark_rejects_tampered_openings():
    log_n = 4
    trace = make_trace(log_n)
    air = CyclicFibAir(F)
    pcs = make_pcs(log_n + 1)
    proof = prove_multi_stark(pcs, air, trace, [], challenger())
    sl = list(proof.shift_locals)
    sl[0] = tuple((c + 1) % F.P for c in sl[0])
    proof.shift_locals = sl
    with pytest.raises((MultiStarkError, WhirError, ValueError)):
        verify_multi_stark(pcs, air, proof, [], challenger())
