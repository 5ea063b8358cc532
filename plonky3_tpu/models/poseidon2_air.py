"""Vectorized Poseidon2 AIR — the flagship benchmark workload.

Behavioral model: `poseidon2-air/src/{air,columns,vectorized,generation}.rs`
(one permutation per column-block, VECTOR_LEN permutations per row,
`examples/examples/prove_prime_field_31.rs:46-48` uses 2^3 per row).

Column block per permutation (columns.rs:11-58), REG = sbox registers:
    inputs[W]
    HALF_FULL × ( sbox[W×REG], post[W] )      beginning full rounds
    PARTIAL   × ( sbox[REG],  post_sbox )      partial rounds
    HALF_FULL × ( sbox[W×REG], post[W] )      ending full rounds

Supported (SBOX_DEGREE, REG): (3,0) KoalaBear, (5,1) Mersenne31,
(7,1) BabyBear — max constraint degree 3 in every case
(air.rs:151-159 `sbox_constraint_degree`).

TPU-first deviations from the reference (documented, protocol-internal):
  * Constraints are emitted as *blocks* over the VECTOR_LEN axis
    (lane-major rather than the reference's perm-major order), so the
    prover's quotient pass is pure array code over (V, Nq) lanes. Prover
    and verifier share the emission order, so proofs are self-consistent.
  * Trace generation runs on device: one `lax.scan` over rounds per round
    section, recording post-states (generation.rs's rayon loop analog).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..air.api import BaseAir
from ..air.builder import stack_syms
from ..hashes.poseidon2 import Poseidon2, default_poseidon2, mds_light

HALF_FULL_ROUNDS = 4


class _SymOps:
    """hashes.poseidon2 ops protocol over AIR Syms (the shared-linear-layer
    trick of `poseidon2/src/generic.rs:32`: permutation and AIR agree)."""

    def add(self, a, b):
        return a + b

    def sub(self, a, b):
        return a - b

    def double(self, a):
        return a + a

    def mul(self, a, b):
        return a * b

    def add_const(self, a, c):
        return a + int(c)

    def mul_const(self, a, c):
        return a * int(c)


def _sbox_registers(d: int) -> int:
    return {3: 0, 5: 1, 7: 1}[d]


class Poseidon2VectorAir(BaseAir):
    num_public_values = 0

    def __init__(self, field, state_width: int = 16, vector_len: int = 8,
                 perm: Poseidon2 | None = None):
        self.field = field
        self.perm = perm or default_poseidon2(field, state_width)
        self.W = state_width
        self.V = vector_len
        self.d = self.perm.d
        self.REG = _sbox_registers(self.d)
        self.PR = len(self.perm.rc_internal)
        W, REG, PR = self.W, self.REG, self.PR
        full_block = W * REG + W
        self.cols_per_perm = (
            W + HALF_FULL_ROUNDS * full_block + PR * (REG + 1)
            + HALF_FULL_ROUNDS * full_block
        )
        self.width = vector_len * self.cols_per_perm

    def max_constraint_degree(self):
        return 3

    # -- column offsets within one permutation block --------------------
    def _off_full(self, section: int, r: int):
        """(sbox_base, post_base) for full round r of section 0/1."""
        W, REG, PR = self.W, self.REG, self.PR
        full_block = W * REG + W
        base = W + r * full_block
        if section == 1:
            base = W + HALF_FULL_ROUNDS * full_block + PR * (REG + 1) \
                + r * full_block
        return base, base + W * REG

    def _off_partial(self, r: int):
        W, REG = self.W, self.REG
        base = W + HALF_FULL_ROUNDS * (W * REG + W) + r * (REG + 1)
        return base, base + REG  # (sbox_base, post_sbox)

    # -------------------------------------------------------------------
    def eval(self, b):
        V, W, C = self.V, self.W, self.cols_per_perm
        cols = b.main.local
        ops = _SymOps()

        def lane(c):
            return stack_syms([cols[v * C + c] for v in range(V)])

        def sbox(x, sbox_base, slot):
            """Degree-3 S-box evaluation; commits registers when REG=1
            (air.rs:305-341 eval_sbox semantics)."""
            if self.REG == 0:  # degree 3 inline
                return x * x * x
            x3c = lane(sbox_base + slot)
            if self.d == 5:
                x2 = x * x
                b.assert_eq_block(x3c, x2 * x, V)
                return x3c * x2
            # d == 7
            b.assert_eq_block(x3c, x * x * x, V)
            return x3c * x3c * x

        state = [lane(w) for w in range(W)]
        state = mds_light(ops, state)

        rc_sections = (
            (0, self.perm.rc_external_initial),
            (None, self.perm.rc_internal),
            (1, self.perm.rc_external_final),
        )
        diag = self.perm.diag_std
        for section, rcs in rc_sections:
            for r, rc in enumerate(rcs):
                if section is None:  # partial round
                    sbox_base, post_c = self._off_partial(r)
                    x = sbox(state[0] + int(rc), sbox_base, 0)
                    post = lane(post_c)
                    b.assert_eq_block(x, post, V)
                    state[0] = post
                    total = state[0]
                    for s in state[1:]:
                        total = total + s
                    state = [
                        total + state[i] * int(diag[i]) for i in range(W)
                    ]
                else:  # full round
                    sbox_base, post_base = self._off_full(section, r)
                    state = [
                        sbox(state[w] + int(rc[w]), sbox_base, w * self.REG)
                        for w in range(W)
                    ]
                    state = mds_light(ops, state)
                    for w in range(W):
                        post = lane(post_base + w)
                        b.assert_eq_block(state[w], post, V)
                        state[w] = post


    # ------------------------------------------------------------------
    # specialized prover path: constraint eval + alpha fold as 3 scans
    # ------------------------------------------------------------------
    def fold_constraints_device(self, F, E, local, nxt, sels, publics_m,
                                alpha_pows):
        """(Nq, width) row window -> (Nq, D) alpha-folded constraints.

        Replaces the generic per-Sym builder trace (~10^4 graph nodes) with
        one lax.scan per round section — same constraint values and the
        SAME alpha-power assignment as the generic `eval` emission order
        (regs then posts, w-major, V-minor), so prover and verifier agree.
        """
        perm = self.perm
        V, W, C, PR, REG = self.V, self.W, self.cols_per_perm, self.PR, self.REG
        Nq = local.shape[0]
        D = E.D
        c = perm._device_consts()
        diag = jnp.asarray(c["diag"])

        x = local.reshape(Nq, V, C)
        B = W * REG + W
        inputs = x[:, :, :W]
        ei = x[:, :, W:W + 4 * B].reshape(Nq, V, 4, B).transpose(2, 0, 1, 3)
        p0 = W + 4 * B
        pr = x[:, :, p0:p0 + PR * (REG + 1)].reshape(
            Nq, V, PR, REG + 1).transpose(2, 0, 1, 3)
        ef = x[:, :, p0 + PR * (REG + 1):].reshape(
            Nq, V, 4, B).transpose(2, 0, 1, 3)

        per_full = V * W * (REG + 1)  # constraints per full round
        per_part = V * (REG + 1)
        k_ei = 4 * per_full
        k_pr = PR * per_part
        a_ei = alpha_pows[:k_ei].reshape(4, per_full, D)
        a_pr = alpha_pows[k_ei:k_ei + k_pr].reshape(PR, per_part, D)
        a_ef = alpha_pows[k_ei + k_pr:].reshape(4, per_full, D)

        def fold(acc, cons, a):
            """cons (Nq, K) in emission order; a (K, D)."""
            return [
                F.add(acc[d], F.sum(F.mul(cons, a[None, :, d]), axis=1))
                for d in range(D)
            ]

        def sbox_cons(s, regs):
            """S-box on (..., lanes): returns (value, constraint, ok_reg).

            regs: committed x^3 columns (or None when REG=0)."""
            s3 = F.mul(F.square(s), s)
            if REG == 0:
                return s3, None
            if self.d == 5:
                s2 = F.square(s)
                return F.mul(regs, s2), F.sub(regs, F.mul(s2, s))
            return F.mul(F.square(regs), s), F.sub(regs, s3)  # d == 7

        def full_body(carry, xs):
            state, acc = carry
            rc, block, a = xs  # rc (W,), block (Nq,V,B), a (per_full,D)
            regs = block[..., :W * REG].reshape(
                (Nq, V, W, REG))[..., 0] if REG else None
            post = block[..., W * REG:]
            s = F.add(state, rc)
            val, reg_cons = sbox_cons(s, regs)
            sm = perm._mds_light_arr(val)
            post_cons = F.sub(sm, post)
            # emission order: [regs w-major (if REG)] then [posts w-major],
            # each (w, v) pair a V-block => flatten as (w, v) row-major
            pieces = []
            if REG:
                pieces.append(reg_cons.transpose(0, 2, 1).reshape(Nq, -1))
            pieces.append(post_cons.transpose(0, 2, 1).reshape(Nq, -1))
            cons = jnp.concatenate(pieces, axis=1)
            acc = fold(acc, cons, a)
            return (post, acc), None

        def partial_body(carry, xs):
            state, acc = carry
            rc, block, a = xs  # block (Nq,V,REG+1)
            regs = block[..., 0] if REG else None
            post = block[..., REG]
            s = F.add(state[..., 0], rc)
            val, reg_cons = sbox_cons(s, regs)
            post_cons = F.sub(val, post)
            pieces = ([reg_cons.reshape(Nq, -1)] if REG else []) + [
                post_cons.reshape(Nq, -1)
            ]
            cons = jnp.concatenate(pieces, axis=1)
            acc = fold(acc, cons, a)
            state = jnp.concatenate(
                [post[..., None], state[..., 1:]], axis=-1
            )
            total = F.sum(state, axis=-1)
            state = F.add(total[..., None], F.mul(state, diag))
            return (state, acc), None

        acc0 = [jnp.zeros((Nq,), jnp.uint32) for _ in range(D)]
        state = perm._mds_light_arr(inputs)
        (state, acc), _ = jax.lax.scan(
            full_body, (state, acc0), (jnp.asarray(c["rc_ei"]), ei, a_ei)
        )
        (state, acc), _ = jax.lax.scan(
            partial_body, (state, acc), (jnp.asarray(c["rc_int"]), pr, a_pr)
        )
        (state, acc), _ = jax.lax.scan(
            full_body, (state, acc), (jnp.asarray(c["rc_ef"]), ef, a_ef)
        )
        return jnp.stack(acc, axis=-1)  # (Nq, D)


def generate_vectorized_trace(air: Poseidon2VectorAir, inputs):
    """Device trace gen: inputs (n_perms, W) uint32 Monty -> (rows, width).

    n_perms must be vector_len × a power of two (generation.rs:29-32).
    One lax.scan per round section; ys collect the committed columns.
    """
    perm, F = air.perm, air.field
    W, REG, V, C = air.W, air.REG, air.V, air.cols_per_perm
    n = inputs.shape[0]
    assert n % V == 0
    c = perm._device_consts()
    diag = jnp.asarray(c["diag"])

    def sbox_with_reg(x):
        """Returns (result, register columns list)."""
        x3 = F.mul(F.square(x), x)
        if REG == 0:
            return x3, None
        if air.d == 5:
            return F.mul(x3, F.square(x)), x3
        return F.mul(F.square(x3), x), x3  # d == 7

    def full_body(s, rc):
        s = F.add(s, rc)
        res, regs = sbox_with_reg(s)
        out = perm._mds_light_arr(res)
        ys = out if REG == 0 else jnp.concatenate([regs, out], axis=-1)
        return out, ys

    def partial_body(s, rc):
        x = F.add(s[..., 0], rc)
        res, regs = sbox_with_reg(x)
        s = jnp.concatenate([res[..., None], s[..., 1:]], axis=-1)
        total = F.sum(s, axis=-1)
        out = F.add(total[..., None], F.mul(s, diag))
        ys = res[..., None] if REG == 0 else jnp.stack([regs, res], axis=-1)
        return out, ys

    x = perm._mds_light_arr(inputs)
    x, ei = jax.lax.scan(full_body, x, jnp.asarray(c["rc_ei"]))
    x, pr = jax.lax.scan(partial_body, x, jnp.asarray(c["rc_int"]))
    x, ef = jax.lax.scan(full_body, x, jnp.asarray(c["rc_ef"]))

    def flat(ys):  # (rounds, n, k) -> (n, rounds*k)
        return jnp.moveaxis(ys, 0, 1).reshape(n, -1)

    per_perm = jnp.concatenate(
        [inputs, flat(ei), flat(pr), flat(ef)], axis=1
    )
    assert per_perm.shape == (n, C)
    return per_perm.reshape(n // V, V * C), x
