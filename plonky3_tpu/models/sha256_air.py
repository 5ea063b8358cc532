"""SHA-256 compression AIR — one compression per row, 7,728 columns.

Column layout and constraint set mirror the reference
(`sha256-air/src/columns.rs:84-210`, `air.rs:105-762`): 32-bit words are
either 32 boolean columns (the w schedule, the a/e working-variable
chains, h_out) or [lo, hi] 16-bit limb pairs (h_in and the per-round
packed intermediates); sigma rotations are per-bit XOR3 expansions
folded limb-wise by Horner, Ch/Maj use the degree-2/3 bit identities,
and the modular adds use the CRT acc·(acc+2^32) checks with
expression-valued outputs wherever the bits are already committed.

TPU shape: the 64 compression rounds and 48 schedule extensions are
uniform, so each stacks into a lane axis and every constraint family
emits as one batched block.
"""

from __future__ import annotations

import numpy as np

from ..air.api import BaseAir
from ..air.builder import Sym, stack_syms

BPL = 16
N_ROUNDS = 64
SCHED_EXT = 48
CHAIN_LEN = 4 + N_ROUNDS  # 68

H0 = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)
K = (
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B,
    0x59F111F1, 0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01,
    0x243185BE, 0x550C7DC3, 0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7,
    0xC19BF174, 0xE49B69C1, 0xEFBE4786, 0x0FC19DC6, 0x240CA1CC,
    0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA, 0x983E5152,
    0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC,
    0x53380D13, 0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85,
    0xA2BFE8A1, 0xA81A664B, 0xC24B8B70, 0xC76C51A3, 0xD192E819,
    0xD6990624, 0xF40E3585, 0x106AA070, 0x19A4C116, 0x1E376C08,
    0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A, 0x5B9CCA4F,
    0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
)

# ---- flat offsets (columns.rs struct order) ----
OFF_H_IN = 0  # [8][2]
OFF_A_CHAIN = OFF_H_IN + 16  # [68][32]
OFF_E_CHAIN = OFF_A_CHAIN + CHAIN_LEN * 32
OFF_W = OFF_E_CHAIN + CHAIN_LEN * 32  # [64][32]
OFF_S_SIG0 = OFF_W + N_ROUNDS * 32  # [48][2]
OFF_S_SIG1 = OFF_S_SIG0 + SCHED_EXT * 2
OFF_S_TMP = OFF_S_SIG1 + SCHED_EXT * 2
OFF_ROUNDS = OFF_S_TMP + SCHED_EXT * 2  # [64][6][2]
ROUND_W = 6 * 2  # sigma1_e, ch, tmp1, t1, sigma0_a, maj
OFF_H_OUT = OFF_ROUNDS + N_ROUNDS * ROUND_W  # [8][32]
NUM_SHA256_COLS = OFF_H_OUT + 8 * 32  # 7728

# per-round packed slots
R_SIG1E, R_CH, R_TMP1, R_T1, R_SIG0A, R_MAJ = range(6)

SIGMA = dict(
    big0=(2, 13, 22, True),
    big1=(6, 11, 25, True),
    small0=(7, 18, 3, False),
    small1=(17, 19, 10, False),
)


def _horner(bits_exprs):
    acc = bits_exprs[-1]
    for e in reversed(bits_exprs[:-1]):
        acc = acc + acc + e
    return acc


class Sha256Air(BaseAir):
    width = NUM_SHA256_COLS
    num_public_values = 0

    def __init__(self, field):
        self.field = field

    def max_constraint_degree(self):
        return 3

    # -- blocks ---------------------------------------------------------
    def _bools(self, b, syms, lanes=1):
        v = stack_syms(syms)
        b.assert_zero_block(v * (v - 1), len(syms) * lanes)

    def _add2(self, b, a, x, c, lanes=1):
        """a = x + c mod 2^32 (limb exprs; air.rs add2_expr_out)."""
        two16, two32 = 1 << 16, (1 << 32) % self.field.P
        acc16 = a[0] - x[0] - c[0]
        acc32 = a[1] - x[1] - c[1]
        acc = acc16 + acc32 * two16
        b.assert_zero_block(acc * (acc + two32), lanes)
        b.assert_zero_block(acc16 * (acc16 + two16), lanes)

    def _add3(self, b, a, x, c, d, lanes=1):
        two16, two32 = 1 << 16, (1 << 32) % self.field.P
        acc16 = a[0] - x[0] - c[0] - d[0]
        acc32 = a[1] - x[1] - c[1] - d[1]
        acc = acc16 + acc32 * two16
        b.assert_zero_block(
            acc * (acc + two32) * (acc + 2 * two32), lanes
        )
        b.assert_zero_block(
            acc16 * (acc16 + two16) * (acc16 + 2 * two16), lanes
        )

    def _pack(self, bits):
        return [_horner(bits[:16]), _horner(bits[16:])]

    def _sigma(self, b, bits, spec, packed, lanes=1):
        """packed = XOR3 of rotated/shifted bit reads (air.rs:624)."""
        r1, r2, r3, rotate = SIGMA[spec]

        def third(i):
            if rotate:
                return bits[(i + r3) % 32]
            src = i + r3
            return bits[src] if src < 32 else None

        exprs = []
        for i in range(32):
            b1, b2, b3 = bits[(i + r1) % 32], bits[(i + r2) % 32], third(i)
            if b3 is None:
                # xor3 with zero -> xor2
                e = b1 + b2 - 2 * (b1 * b2)
            else:
                p12 = b1 * b2
                e = (
                    b1 + b2 + b3
                    - 2 * (p12 + b1 * b3 + b2 * b3)
                    + 4 * (p12 * b3)
                )
            exprs.append(e)
        built = self._pack(exprs)
        b.assert_zero_block(packed[0] - built[0], lanes)
        b.assert_zero_block(packed[1] - built[1], lanes)

    def _ch(self, b, e, f, g, packed, lanes=1):
        exprs = [
            e[i] * f[i] + (1 - e[i]) * g[i] for i in range(32)
        ]
        built = self._pack(exprs)
        b.assert_zero_block(packed[0] - built[0], lanes)
        b.assert_zero_block(packed[1] - built[1], lanes)

    def _maj(self, b, a, x, c, packed, lanes=1):
        exprs = [
            a[i] * x[i] + c[i] * (a[i] + x[i] - 2 * (a[i] * x[i]))
            for i in range(32)
        ]
        built = self._pack(exprs)
        b.assert_zero_block(packed[0] - built[0], lanes)
        b.assert_zero_block(packed[1] - built[1], lanes)

    # -- eval -----------------------------------------------------------
    def eval(self, b):
        cols = b.main.local

        def bits(off):
            return cols[off : off + 32]

        def w_bits(t):
            return bits(OFF_W + 32 * t)

        def a_chain(i):
            return bits(OFF_A_CHAIN + 32 * i)

        def e_chain(i):
            return bits(OFF_E_CHAIN + 32 * i)

        def round_slot(t, which):
            o = OFF_ROUNDS + t * ROUND_W + 2 * which
            return cols[o : o + 2]

        def lane_stack(per_lane):
            k = len(per_lane[0])
            return [
                stack_syms([lane[j] for lane in per_lane])
                for j in range(k)
            ]

        # Phase 1: booleanity (air.rs:127) — ONE stacked block over all
        # 6,656 bit columns (w schedule, both chains, h_out)
        all_bits = []
        for t in range(N_ROUNDS):
            all_bits.extend(w_bits(t))
        for i in range(CHAIN_LEN):
            all_bits.extend(a_chain(i))
            all_bits.extend(e_chain(i))
        for i in range(8):
            all_bits.extend(bits(OFF_H_OUT + 32 * i))
        self._bools(b, all_bits)

        # Phase 2: h_in matches reversed chain prefixes (air.rs:164)
        for i in range(4):
            pk = self._pack(a_chain(3 - i))
            b.assert_zero(cols[OFF_H_IN + 2 * i] - pk[0])
            b.assert_zero(cols[OFF_H_IN + 2 * i + 1] - pk[1])
            pk = self._pack(e_chain(3 - i))
            b.assert_zero(cols[OFF_H_IN + 2 * (4 + i)] - pk[0])
            b.assert_zero(cols[OFF_H_IN + 2 * (4 + i) + 1] - pk[1])

        # Phase 3: message schedule, 48 stacked lanes (air.rs:193)
        s_w15 = lane_stack([w_bits(t - 15) for t in range(16, 64)])
        s_w2 = lane_stack([w_bits(t - 2) for t in range(16, 64)])
        s_w7 = lane_stack([w_bits(t - 7) for t in range(16, 64)])
        s_w16 = lane_stack([w_bits(t - 16) for t in range(16, 64)])
        s_wt = lane_stack([w_bits(t) for t in range(16, 64)])
        s_sig0 = lane_stack([
            list(cols[OFF_S_SIG0 + 2 * i : OFF_S_SIG0 + 2 * i + 2])
            for i in range(SCHED_EXT)
        ])
        s_sig1 = lane_stack([
            list(cols[OFF_S_SIG1 + 2 * i : OFF_S_SIG1 + 2 * i + 2])
            for i in range(SCHED_EXT)
        ])
        s_tmp = lane_stack([
            list(cols[OFF_S_TMP + 2 * i : OFF_S_TMP + 2 * i + 2])
            for i in range(SCHED_EXT)
        ])
        L = SCHED_EXT
        self._sigma(b, s_w15, "small0", s_sig0, L)
        self._sigma(b, s_w2, "small1", s_sig1, L)
        self._add2(b, s_tmp, s_sig1, self._pack(s_w7), L)
        self._add3(
            b, self._pack(s_wt), s_tmp, s_sig0, self._pack(s_w16), L
        )

        # Phase 4: compression, 64 stacked lanes (air.rs:273)
        a_s = lane_stack([a_chain(t + 3) for t in range(64)])
        b_s = lane_stack([a_chain(t + 2) for t in range(64)])
        c_s = lane_stack([a_chain(t + 1) for t in range(64)])
        d_s = lane_stack([a_chain(t) for t in range(64)])
        e_s = lane_stack([e_chain(t + 3) for t in range(64)])
        f_s = lane_stack([e_chain(t + 2) for t in range(64)])
        g_s = lane_stack([e_chain(t + 1) for t in range(64)])
        h_s = lane_stack([e_chain(t) for t in range(64)])
        na_s = lane_stack([a_chain(t + 4) for t in range(64)])
        ne_s = lane_stack([e_chain(t + 4) for t in range(64)])
        slots = [
            lane_stack([list(round_slot(t, wh)) for t in range(64)])
            for wh in range(6)
        ]
        k_lo = Sym(
            b.backend, b.backend.const_vec([K[t] & 0xFFFF for t in range(64)])
        )
        k_hi = Sym(
            b.backend, b.backend.const_vec([K[t] >> 16 for t in range(64)])
        )
        L = N_ROUNDS
        self._sigma(b, e_s, "big1", slots[R_SIG1E], L)
        self._ch(b, e_s, f_s, g_s, slots[R_CH], L)
        self._add3(
            b, slots[R_TMP1], slots[R_SIG1E], slots[R_CH],
            self._pack(h_s), L,
        )
        self._add3(
            b, slots[R_T1], slots[R_TMP1], [k_lo, k_hi],
            self._pack(lane_stack([w_bits(t) for t in range(64)])), L,
        )
        self._sigma(b, a_s, "big0", slots[R_SIG0A], L)
        self._maj(b, a_s, b_s, c_s, slots[R_MAJ], L)
        self._add3(
            b, self._pack(na_s), slots[R_T1], slots[R_SIG0A],
            slots[R_MAJ], L,
        )
        self._add2(b, self._pack(ne_s), slots[R_T1], self._pack(d_s), L)

        # Phase 5: finalization (air.rs:394)
        fin_a = lane_stack([a_chain(CHAIN_LEN - 1 - i) for i in range(4)])
        fin_e = lane_stack([e_chain(CHAIN_LEN - 1 - i) for i in range(4)])
        ho_a = lane_stack([bits(OFF_H_OUT + 32 * i) for i in range(4)])
        ho_e = lane_stack([
            bits(OFF_H_OUT + 32 * (4 + i)) for i in range(4)
        ])
        hin_a = lane_stack([
            list(cols[OFF_H_IN + 2 * i : OFF_H_IN + 2 * i + 2])
            for i in range(4)
        ])
        hin_e = lane_stack([
            list(cols[OFF_H_IN + 2 * (4 + i) : OFF_H_IN + 2 * (4 + i) + 2])
            for i in range(4)
        ])
        self._add2(b, self._pack(ho_a), hin_a, self._pack(fin_a), 4)
        self._add2(b, self._pack(ho_e), hin_e, self._pack(fin_e), 4)


# ---------------------------------------------------------------------------
# trace generation (vectorized over rows)
# ---------------------------------------------------------------------------
def _rotr(x, r):
    return ((x >> np.uint32(r)) | (x << np.uint32(32 - r))).astype(
        np.uint32
    )


def generate_sha256_trace(F, inputs: np.ndarray) -> np.ndarray:
    """inputs: (n, 24) uint32 — 16 block words + 8 input state words.
    Returns (n, 7728) standard-form uint32 trace."""
    n = inputs.shape[0]
    assert n & (n - 1) == 0
    inputs = inputs.astype(np.uint32)
    tr = np.zeros((n, NUM_SHA256_COLS), dtype=np.uint32)

    def put_bits(base, words):
        for z in range(32):
            tr[:, base + z] = (words >> np.uint32(z)) & 1

    def put_limbs(base, words):
        tr[:, base] = words & 0xFFFF
        tr[:, base + 1] = words >> 16

    h_in = [inputs[:, 16 + i].copy() for i in range(8)]
    for i in range(8):
        put_limbs(OFF_H_IN + 2 * i, h_in[i])

    # message schedule
    w = [inputs[:, t].copy() for t in range(16)]
    with np.errstate(over="ignore"):
        for t in range(16, 64):
            s0 = (
                _rotr(w[t - 15], 7) ^ _rotr(w[t - 15], 18)
                ^ (w[t - 15] >> np.uint32(3))
            )
            s1 = (
                _rotr(w[t - 2], 17) ^ _rotr(w[t - 2], 19)
                ^ (w[t - 2] >> np.uint32(10))
            )
            i = t - 16
            put_limbs(OFF_S_SIG0 + 2 * i, s0)
            put_limbs(OFF_S_SIG1 + 2 * i, s1)
            tmp = (s1 + w[t - 7]).astype(np.uint32)
            put_limbs(OFF_S_TMP + 2 * i, tmp)
            w.append((tmp + s0 + w[t - 16]).astype(np.uint32))
        for t in range(64):
            put_bits(OFF_W + 32 * t, w[t])

        # chains: reversed prefix then one entry per round
        a_chain = [h_in[3], h_in[2], h_in[1], h_in[0]]
        e_chain = [h_in[7], h_in[6], h_in[5], h_in[4]]
        a, bb, c, d = h_in[0], h_in[1], h_in[2], h_in[3]
        e, f, g, h = h_in[4], h_in[5], h_in[6], h_in[7]
        for t in range(64):
            s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            tmp1 = (h + s1 + ch).astype(np.uint32)
            t1 = (tmp1 + np.uint32(K[t]) + w[t]).astype(np.uint32)
            s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & bb) ^ (a & c) ^ (bb & c)
            new_a = (t1 + s0 + maj).astype(np.uint32)
            new_e = (d + t1).astype(np.uint32)
            put_limbs(OFF_ROUNDS + t * ROUND_W + 2 * R_SIG1E, s1)
            put_limbs(OFF_ROUNDS + t * ROUND_W + 2 * R_CH, ch)
            put_limbs(OFF_ROUNDS + t * ROUND_W + 2 * R_TMP1, tmp1)
            put_limbs(OFF_ROUNDS + t * ROUND_W + 2 * R_T1, t1)
            put_limbs(OFF_ROUNDS + t * ROUND_W + 2 * R_SIG0A, s0)
            put_limbs(OFF_ROUNDS + t * ROUND_W + 2 * R_MAJ, maj)
            a_chain.append(new_a)
            e_chain.append(new_e)
            a, bb, c, d = new_a, a, bb, c
            e, f, g, h = new_e, e, f, g
        for i in range(CHAIN_LEN):
            put_bits(OFF_A_CHAIN + 32 * i, a_chain[i])
            put_bits(OFF_E_CHAIN + 32 * i, e_chain[i])
        for i in range(8):
            final = (a_chain, e_chain)[i // 4][CHAIN_LEN - 1 - (i % 4)]
            put_bits(
                OFF_H_OUT + 32 * i,
                (h_in[i] + final).astype(np.uint32),
            )
    return tr
