"""Vectorized Poseidon1 AIR (poseidon1-air/src/{air,columns}.rs model).

One permutation per column block, VECTOR_LEN blocks per row — the same
trace architecture as models/poseidon2_air.py. Textbook round form
(equivalent to the reference's sparse factorization — see
hashes/poseidon1.py): AddRC (all lanes) -> S-box (all / lane 0) -> dense
circulant MDS. Full rounds commit the post-MDS state; partial rounds
commit the S-box output (pre-MDS), keeping every running value degree 1.

v1 supports SBOX_REGISTERS = 0 (degree-3 fields: KoalaBear).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..air.api import BaseAir
from ..air.builder import stack_syms
from ..hashes.poseidon1 import Poseidon1, default_poseidon1


class Poseidon1VectorAir(BaseAir):
    num_public_values = 0

    def __init__(self, field, state_width: int = 16, vector_len: int = 1,
                 perm: Poseidon1 | None = None):
        self.field = field
        self.perm = perm or default_poseidon1(field, state_width)
        assert self.perm.d == 3, "v1: SBOX_REGISTERS = 0 (degree 3) only"
        self.W = state_width
        self.V = vector_len
        self.HF = self.perm.half_full
        self.PR = self.perm.partial
        self.cols_per_perm = (
            self.W + self.HF * self.W + self.PR + self.HF * self.W
        )
        self.width = vector_len * self.cols_per_perm

    def max_constraint_degree(self):
        return 3

    def _mds_syms(self, state):
        w = self.W
        row = self.perm.mds_first_row
        out = []
        for i in range(w):
            acc = state[0] * int(row[(0 - i) % w])
            for j in range(1, w):
                acc = acc + state[j] * int(row[(j - i) % w])
            out.append(acc)
        return out

    def eval(self, b):
        V, W, C = self.V, self.W, self.cols_per_perm
        cols = b.main.local

        def lane(c):
            return stack_syms([cols[v * C + c] for v in range(V)])

        state = [lane(w) for w in range(W)]
        rc = self.perm.rc
        HF, PR = self.HF, self.PR
        for r in range(len(rc)):
            is_full = r < HF or r >= HF + PR
            state = [state[i] + int(rc[r][i]) for i in range(W)]
            if is_full:
                state = [x * x * x for x in state]
                state = self._mds_syms(state)
                base = (
                    W + r * W
                    if r < HF
                    else W + HF * W + PR + (r - HF - PR) * W
                )
                for w in range(W):
                    post = lane(base + w)
                    b.assert_eq_block(state[w], post, V)
                    state[w] = post
            else:
                x3 = state[0] * state[0] * state[0]
                post = lane(W + HF * W + (r - HF))
                b.assert_eq_block(x3, post, V)
                state[0] = post
                state = self._mds_syms(state)

    # ------------------------------------------------------------------
    def fold_constraints_device(self, F, E, local, nxt, sels, publics_m,
                                alpha_pows):
        """Scan-based quotient fold (same alpha assignment as eval's
        emission order: full-round posts w-major/V-minor, partial single
        V-blocks)."""
        perm = self.perm
        V, W, C, PR, HF = self.V, self.W, self.cols_per_perm, self.PR, self.HF
        Nq = local.shape[0]
        D = E.D
        c = perm._consts()
        mds = jnp.asarray(c["mds"])  # (W, W) monty
        rc_all = jnp.asarray(c["rc"])  # (rounds, W) monty

        x = local.reshape(Nq, V, C)
        inputs = x[:, :, :W]
        ei = x[:, :, W:W + HF * W].reshape(Nq, V, HF, W).transpose(
            2, 0, 1, 3
        )
        p0 = W + HF * W
        pr = x[:, :, p0:p0 + PR].reshape(Nq, V, PR).transpose(2, 0, 1)
        ef = x[:, :, p0 + PR:].reshape(Nq, V, HF, W).transpose(2, 0, 1, 3)

        per_full = V * W
        a_ei = alpha_pows[: HF * per_full].reshape(HF, per_full, D)
        a_pr = alpha_pows[
            HF * per_full : HF * per_full + PR * V
        ].reshape(PR, V, D)
        a_ef = alpha_pows[HF * per_full + PR * V :].reshape(
            HF, per_full, D
        )

        def mds_mul(s):
            prods = F.mul(s[..., None, :], mds)
            return F.sum(prods, axis=-1)

        def fold(acc, cons, a):
            return [
                F.add(acc[d], F.sum(F.mul(cons, a[None, :, d]), axis=1))
                for d in range(D)
            ]

        def full_body(carry, xs):
            state, acc = carry
            rc, post, a = xs
            s = F.add(state, rc)
            s3 = F.mul(F.square(s), s)
            sm = mds_mul(s3)
            cons = F.sub(sm, post).transpose(0, 2, 1).reshape(Nq, -1)
            acc = fold(acc, cons, a)
            return (post, acc), None

        def partial_body(carry, xs):
            state, acc = carry
            rc, post, a = xs  # post (Nq, V)
            s = F.add(state, rc)
            x3 = F.mul(F.square(s[..., 0]), s[..., 0])
            cons = F.sub(x3, post).reshape(Nq, -1)
            acc = fold(acc, cons, a)
            s = jnp.concatenate([post[..., None], s[..., 1:]], axis=-1)
            return (mds_mul(s), acc), None

        acc0 = [jnp.zeros((Nq,), jnp.uint32) for _ in range(D)]
        state = inputs
        (state, acc), _ = jax.lax.scan(
            full_body, (state, acc0),
            (rc_all[:HF], ei, a_ei),
        )
        (state, acc), _ = jax.lax.scan(
            partial_body, (state, acc),
            (rc_all[HF:HF + PR], pr, a_pr),
        )
        (state, acc), _ = jax.lax.scan(
            full_body, (state, acc),
            (rc_all[HF + PR:], ef, a_ef),
        )
        return jnp.stack(acc, axis=-1)


def generate_vectorized_trace_p1(air: Poseidon1VectorAir, inputs_std):
    """Host numpy trace gen: inputs (n_perms, W) standard -> (rows, width)
    standard-form numpy + final states."""
    perm = air.perm
    F = air.field
    W, V, C, HF, PR = air.W, air.V, air.cols_per_perm, air.HF, air.PR
    n = inputs_std.shape[0]
    assert n % V == 0
    P = np.uint64(F.P)
    row = np.array(
        [[perm.mds_first_row[(j - i) % W] for j in range(W)]
         for i in range(W)],
        dtype=np.uint64,
    )

    def mds(s):
        return ((s[..., None, :] * row) % P).sum(axis=-1) % P

    x = inputs_std.astype(np.uint64) % P
    pieces = [x.astype(np.uint32)]
    for r in range(len(perm.rc)):
        is_full = r < HF or r >= HF + PR
        x = (x + np.array(perm.rc[r], dtype=np.uint64) % P) % P
        if is_full:
            x = (x * x % P) * x % P
            x = mds(x)
            pieces.append(x.astype(np.uint32))
        else:
            x3 = (x[:, 0] * x[:, 0] % P) * x[:, 0] % P
            pieces.append(x3.astype(np.uint32)[:, None])
            x = x.copy()
            x[:, 0] = x3
            x = mds(x)
    trace = np.concatenate(pieces, axis=1)
    assert trace.shape == (n, C)
    return trace.reshape(n // V, V * C), x.astype(np.uint32)
