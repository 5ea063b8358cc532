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

        Replaces the generic per-Sym builder trace (~10^4 graph nodes)
        with a row-chunked lax.map whose body UNROLLS all rounds — same
        constraint values and the SAME alpha-power assignment as the
        generic `eval` emission order (regs then posts, w-major,
        V-minor), so prover and verifier agree.

        Perf structure (measured on v5e): a lax.scan over rounds carries
        the (Nq, V, W) state through HBM every step (~10 GB of carry
        traffic at 2^18 rows); unrolling inside a 2^13-row chunk keeps
        state, round slabs and the fold accumulators VMEM-sized. The
        alpha fold runs on the MXU: constraints split into four u8 limb
        planes, alpha powers into eight u4 planes, one bf16 matmul per
        round accumulating into 32 f32 limb-pair planes carried across
        rounds (every partial stays < n_cons·255·15 < 2^24, so f32
        accumulation is exact), recombined once per chunk with 32 Monty
        multiplies by raw 2^{8k+4l} — R²Σ/R = RΣ, the Monty form of the
        true fold. Internal-layer diagonal muls use Shoup form
        (constants)."""
        perm = self.perm
        V, W, C, PR, REG = self.V, self.W, self.cols_per_perm, self.PR, self.REG
        Nq = local.shape[0]
        D = E.D
        c = perm._device_consts()

        diag_std_np = np.asarray(
            [int(d) % F.P for d in perm.diag_std], np.uint32
        )
        diag_std = jnp.asarray(diag_std_np)
        diag_sh = jnp.asarray(F.shoup_np(diag_std_np))

        B = W * REG + W
        per_full = V * W * (REG + 1)  # constraints per full round
        per_part = V * (REG + 1)
        k_ei = 4 * per_full
        k_pr = PR * per_part
        n_cons = k_ei + k_pr + 4 * per_full
        a_ei = alpha_pows[:k_ei].reshape(4, per_full, D)
        a_pr = alpha_pows[k_ei:k_ei + k_pr].reshape(PR, per_part, D)
        a_ef = alpha_pows[k_ei + k_pr:].reshape(4, per_full, D)
        assert n_cons * 255 * 15 < (1 << 24)

        def a_planes(a):  # (steps, K, D) monty u32 -> (steps, K, D·8) bf16
            s, K, _ = a.shape
            return jnp.stack(
                [(a >> (4 * l)) & 0xF for l in range(8)], axis=-1
            ).astype(jnp.bfloat16).reshape(s, K, D * 8)

        a4_ei, a4_pr, a4_ef = a_planes(a_ei), a_planes(a_pr), a_planes(a_ef)
        rc_ei = np.asarray(c["rc_ei"])
        rc_int = np.asarray(c["rc_int"])
        rc_ef = np.asarray(c["rc_ef"])

        chunk = min(Nq, 1 << 13)
        n_chunks = Nq // chunk

        def sbox_cons(s, regs):
            """S-box on (..., lanes): returns (value, constraint)."""
            s3 = F.mul(F.square(s), s)
            if REG == 0:
                return s3, None
            if self.d == 5:
                s2 = F.square(s)
                return F.mul(regs, s2), F.sub(regs, F.mul(s2, s))
            return F.mul(F.square(regs), s), F.sub(regs, s3)  # d == 7

        def fold(acc_f, cons, a4):
            """cons (chunk, K) monty u32 in emission order; a4 (K, D·8)."""
            K = cons.shape[1]
            m8 = jnp.stack(
                [(cons >> (8 * k)) & 0xFF for k in range(4)], axis=0
            ).astype(jnp.bfloat16).reshape(4 * chunk, K)
            part = jnp.dot(m8, a4, preferred_element_type=jnp.float32)
            return acc_f + part

        def chunk_body(xc):  # (chunk, V, C) -> (chunk, D)
            inputs = xc[:, :, :W]
            ei = xc[:, :, W:W + 4 * B].reshape(chunk, V, 4, B)
            p0 = W + 4 * B
            pr = xc[:, :, p0:p0 + PR * (REG + 1)].reshape(
                chunk, V, PR, REG + 1)
            ef = xc[:, :, p0 + PR * (REG + 1):].reshape(chunk, V, 4, B)

            acc = jnp.zeros((4 * chunk, D * 8), jnp.float32)
            state = perm._mds_light_arr(inputs)

            def full_round(state, acc, rc, block, a4):
                regs = block[..., :W * REG].reshape(
                    (chunk, V, W, REG))[..., 0] if REG else None
                post = block[..., W * REG:]
                s = F.add(state, jnp.asarray(rc))
                val, reg_cons = sbox_cons(s, regs)
                sm = perm._mds_light_arr(val)
                post_cons = F.sub(sm, post)
                pieces = []
                if REG:
                    pieces.append(
                        reg_cons.transpose(0, 2, 1).reshape(chunk, -1)
                    )
                pieces.append(post_cons.transpose(0, 2, 1).reshape(chunk, -1))
                return post, fold(acc, jnp.concatenate(pieces, axis=1), a4)

            def partial_round(state, acc, rc, block, a4):
                regs = block[..., 0] if REG else None
                post = block[..., REG]
                s = F.add(state[..., 0], jnp.uint32(rc))
                val, reg_cons = sbox_cons(s, regs)
                post_cons = F.sub(val, post)
                pieces = ([reg_cons.reshape(chunk, -1)] if REG else []) + [
                    post_cons.reshape(chunk, -1)
                ]
                acc = fold(acc, jnp.concatenate(pieces, axis=1), a4)
                state = jnp.concatenate(
                    [post[..., None], state[..., 1:]], axis=-1
                )
                total = F.sum(state, axis=-1)
                state = F.add(
                    total[..., None], F.mul_shoup(state, diag_std, diag_sh)
                )
                return state, acc

            for r in range(4):
                state, acc = full_round(
                    state, acc, rc_ei[r], ei[:, :, r], a4_ei[r]
                )
            for r in range(PR):
                state, acc = partial_round(
                    state, acc, rc_int[r], pr[:, :, r], a4_pr[r]
                )
            for r in range(4):
                state, acc = full_round(
                    state, acc, rc_ef[r], ef[:, :, r], a4_ef[r]
                )

            acc_u = acc.reshape(4, chunk, D, 8).astype(jnp.uint32)
            out = None
            for k in range(4):
                for l in range(8):
                    cc = jnp.uint32((1 << (8 * k + 4 * l)) % F.P)
                    term = F.mul(acc_u[k, :, :, l], cc)
                    out = term if out is None else F.add(out, term)
            return out  # (chunk, D)

        if n_chunks == 1:
            return chunk_body(local.reshape(chunk, V, C))
        out = jax.lax.map(
            chunk_body, local.reshape(n_chunks, chunk, V, C)
        )
        return out.reshape(Nq, D)


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
