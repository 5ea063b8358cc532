"""Sumcheck / zerocheck (multi-stark core): round-trip + tamper +
trivial-PCS opening checks (multi-stark/tests model, with the trivial
commitment standing in for WHIR)."""

import numpy as np
import pytest

from plonky3_tpu.air.api import BaseAir
from plonky3_tpu.challenger.duplex import DuplexChallenger
from plonky3_tpu.fields import KoalaBearExt4 as E
from plonky3_tpu.fields.params import KoalaBear as F
from plonky3_tpu.hashes.poseidon2 import default_poseidon2
from plonky3_tpu.multilinear import (
    eval_mle_host,
    prove_zerocheck,
    verify_zerocheck,
)


class CyclicMulAir(BaseAir):
    """Transition-only AIR: next.a = a*b, next.b = b (cyclic)."""

    width = 2
    num_public_values = 0

    def __init__(self, field):
        self.field = field

    def eval(self, b):
        local, nxt = b.main.local, b.main.next
        t = b.when_transition()
        t.assert_eq(nxt[1], local[1])
        t.assert_eq(nxt[0], local[0] * local[1])


def _gen_trace(log_n, b=3):
    n = 1 << log_n
    rows = np.zeros((n, 2), dtype=np.uint32)
    a = 1
    for i in range(n):
        rows[i] = (a, b)
        a = (a * b) % F.P
    # cyclic wrap holds iff b^n = 1; choose b = generator of order n
    g = F.exp_h(F.two_adic_generator_h(log_n), 1)
    rows = np.zeros((n, 2), dtype=np.uint32)
    a = 1
    for i in range(n):
        rows[i] = (a, g)
        a = (a * g) % F.P
    return rows


def _challenger():
    return DuplexChallenger(default_poseidon2(F, 24), rate=16)


def test_zerocheck_roundtrip():
    air = CyclicMulAir(F)
    trace = _gen_trace(4)
    ch = _challenger()
    proof, fl, fn, _ = prove_zerocheck(E, air, trace, [], ch)

    vch = _challenger()
    chs = verify_zerocheck(E, air, 4, [], proof, fl, fn, vch)

    # trivial multilinear PCS check: claimed openings == direct MLE evals
    for j in range(air.width):
        col = [int(x) for x in trace[:, j]]
        assert eval_mle_host(E, col, chs) == fl[j]
        shifted = col[1:] + col[:1]
        assert eval_mle_host(E, shifted, chs) == fn[j]


def test_zerocheck_rejects_bad_trace():
    air = CyclicMulAir(F)
    trace = _gen_trace(4)
    trace[5, 0] ^= 1  # violate the transition
    ch = _challenger()
    proof, fl, fn, _ = prove_zerocheck(E, air, trace, [], ch)
    vch = _challenger()
    with pytest.raises(ValueError):
        verify_zerocheck(E, air, 4, [], proof, fl, fn, vch)


def test_zerocheck_rejects_tampered_round_poly():
    air = CyclicMulAir(F)
    trace = _gen_trace(3)
    ch = _challenger()
    proof, fl, fn, _ = prove_zerocheck(E, air, trace, [], ch)
    proof.round_polys[1][0] = E.add_h(proof.round_polys[1][0], E.one_h())
    vch = _challenger()
    with pytest.raises(ValueError):
        verify_zerocheck(E, air, 3, [], proof, fl, fn, vch)
