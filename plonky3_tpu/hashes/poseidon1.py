"""Poseidon1 (classic Poseidon) permutation — textbook form.

Behavioral spec: `poseidon1/src/lib.rs` (RF/2 full + RP partial + RF/2
full; each round = AddRC -> S-box -> MDS). The reference's sparse-matrix
partial-round optimization (Appendix B factorization) is an equivalent
reformulation of the same permutation, so the dense/textbook evaluation
below produces identical outputs (validated against the reference KATs,
koala-bear/src/poseidon1.rs:535,552).

The MDS layer is the circulant matrix with the per-field first row
(koala-bear/src/mds.rs:19-26): M[i][j] = row[(j - i) mod w]. On device
the matmul is a width-w circular correlation over u32 lanes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..fields.monty31 import Monty31
from .constants import poseidon1_constants as C
from .poseidon2 import S_BOX_DEGREE


@dataclass(frozen=True)
class Poseidon1:
    F: Monty31
    width: int
    d: int
    half_full: int
    rc: tuple  # (rounds, width) standard ints: [full | partial | full]
    mds_first_row: tuple  # standard ints

    @property
    def partial(self):
        return len(self.rc) - 2 * self.half_full

    # ---- host (exact ints) ----
    def _mds_host(self, state):
        P, w = self.F.P, self.width
        row = self.mds_first_row
        return [
            sum(row[(j - i) % w] * state[j] for j in range(w)) % P
            for i in range(w)
        ]

    def _sbox_host(self, x):
        return pow(x, self.d, self.F.P)

    def permute_host(self, state):
        P = self.F.P
        state = [x % P for x in state]
        rf2, rp = self.half_full, self.partial
        for r, rc in enumerate(self.rc):
            state = [(x + c) % P for x, c in zip(state, rc)]
            if rf2 <= r < rf2 + rp:
                state[0] = self._sbox_host(state[0])
            else:
                state = [self._sbox_host(x) for x in state]
            state = self._mds_host(state)
        return state

    # ---- device / numpy (batched (..., width) Monty u32) ----
    def _consts(self):
        cached = getattr(self, "_dc", None)
        if cached is None:
            F = self.F
            cached = dict(
                rc=F.to_monty_np(
                    np.asarray(self.rc, dtype=np.uint64) % F.P
                ),
                # mds rows in monty form, shape (w, w): M[i][j]
                mds=F.to_monty_np(
                    np.array(
                        [
                            [
                                self.mds_first_row[(j - i) % self.width]
                                % F.P
                                for j in range(self.width)
                            ]
                            for i in range(self.width)
                        ],
                        dtype=np.uint64,
                    ) % F.P
                ),
            )
            object.__setattr__(self, "_dc", cached)
        return cached

    def _arr_perm(self, xp, Fops, states):
        c = self._consts()
        rc_all = c["rc"]
        mds = c["mds"]  # (w, w) monty
        w = self.width
        rf2, rp = self.half_full, self.partial

        def sbox(x):
            if self.d == 3:
                return Fops.mul(Fops.square(x), x)
            if self.d == 5:
                return Fops.mul(Fops.square(Fops.square(x)), x)
            if self.d == 7:
                x2 = Fops.square(x)
                return Fops.mul(Fops.mul(Fops.square(x2), x2), x)
            raise ValueError(self.d)

        def mds_mul(x):
            # y[..., i] = sum_j M[i][j] * x[..., j]
            prods = Fops.mul(x[..., None, :], xp.asarray(mds))
            return Fops.sum(prods, axis=-1)

        x = states
        for r in range(len(self.rc)):
            x = Fops.add(x, xp.asarray(rc_all[r]))
            if rf2 <= r < rf2 + rp:
                s0 = sbox(x[..., 0])
                x = xp.concatenate([s0[..., None], x[..., 1:]], axis=-1)
            else:
                x = sbox(x)
            x = mds_mul(x)
        return x

    def permute_device(self, states):
        return _poseidon1_device_jit(self, states)

    def permute_np(self, states):
        return self._arr_perm(np, _NpFOps(self.F), np.asarray(states))


class _NpFOps:
    def __init__(self, F):
        self.F = F

    def add(self, a, b):
        return self.F.add_np(a, b)

    def mul(self, a, b):
        return self.F.mul_np(a, b)

    def square(self, a):
        return self.F.square_np(a)

    def sum(self, x, axis):
        return self.F.sum_np(x, axis=axis)


import functools as _functools

import jax as _jax


@_functools.partial(_jax.jit, static_argnums=0)
def _poseidon1_device_jit(perm: Poseidon1, states):
    return perm._arr_perm(jnp, perm.F, states)


def default_poseidon1(F: Monty31, width: int) -> Poseidon1:
    """default_{koalabear,babybear}_poseidon1_{16,24}
    (koala-bear/src/poseidon1.rs:461,471)."""
    prefix = F.name.upper()
    rc = getattr(C, f"{prefix}_POSEIDON1_RC_{width}")
    row = getattr(C, f"{prefix}_MDS_FIRST_ROW_{width}")
    return Poseidon1(
        F=F,
        width=width,
        d=S_BOX_DEGREE[F.name],
        half_full=4,
        rc=rc,
        mds_first_row=row,
    )
