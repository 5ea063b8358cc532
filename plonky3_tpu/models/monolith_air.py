"""Monolith-Mersenne31 AIR — one permutation per row, 3,520 columns.

Mirrors the reference (`monolith-air/src/{columns.rs,air.rs}`,
instantiated as in `lib.rs:45-89`): WIDTH 16, 5 full rounds + 1 final,
8 Bars with limb widths [8, 8, 8, 7] (FIELD_BITS 31, 24 committed chi
cells, 15 match flags per Bar). Per round:

  Bars:   boolean bits; linear reconstruction to the round input;
          chi AND-product witnesses chi[j] = (1-x[j-2])·x[j-3]·x[j-4]
          (trailing 7-bit limb inlines its 2-input AND); committed Bar
          output equals the recombined chi S-box; the canonical
          bit-pattern walk pairs the modulus one-bits two per committed
          flag and rejects any encoding >= p (air.rs:482-525 — for
          Mersenne31 every modulus bit is 1: 15 pairs, the final bit 0
          folds into the closing assertion).
  Bricks: post[i] = bars[i] + bars[i-1]^2 (degree 2).
  Concrete: circulant MDS; + round constants except the final round.
  Post binding caps every round at degree <= 3.

TPU shape: the 48 (round, bar) slots and 6 round bindings stack into
lane axes so each constraint family is one batched block. Round
constants and the MDS row are the repo's KAT-validated MonolithM31 data
(hashes/monolith.py).
"""

from __future__ import annotations

import numpy as np

from ..air.api import BaseAir
from ..air.builder import Sym, stack_syms
from ..hashes.monolith import MDS_ROW_16, MonolithM31

WIDTH = 16
N_ROUNDS = 5  # full rounds with constants; +1 final round
N_BARS = 8
FIELD_BITS = 31
LIMB_BITS = (8, 8, 8, 7)
N_CHI = 24  # committed chi cells per bar (8+8+8; 7-bit limb inlined)
N_MFLAGS = 15  # Mersenne31: 31 one-bits -> 15 pairs
P = (1 << 31) - 1

# per-round block: bits 8*31 + chi 8*24 + mflags 8*15 + bars_out 8 + post 16
BAR_BLOCK = FIELD_BITS + N_CHI + N_MFLAGS  # per bar: 70
ROUND_W = N_BARS * BAR_BLOCK + N_BARS + WIDTH  # 584
OFF_INPUTS = 0
OFF_ROUNDS = WIDTH
NUM_MONOLITH_COLS = WIDTH + (N_ROUNDS + 1) * ROUND_W  # 3520


def _round_off(r):
    return OFF_ROUNDS + r * ROUND_W


def _bits_off(r, bar):
    return _round_off(r) + bar * FIELD_BITS


def _chi_off(r, bar):
    return _round_off(r) + N_BARS * FIELD_BITS + bar * N_CHI


def _mflag_off(r, bar):
    return (
        _round_off(r) + N_BARS * (FIELD_BITS + N_CHI) + bar * N_MFLAGS
    )


def _barout_off(r):
    return _round_off(r) + N_BARS * BAR_BLOCK


def _post_off(r):
    return _barout_off(r) + N_BARS


def _pack(bits):
    acc = bits[-1]
    for b in reversed(bits[:-1]):
        acc = acc + acc + b
    return acc


class MonolithAir(BaseAir):
    width = NUM_MONOLITH_COLS
    num_public_values = 0

    def __init__(self, field):
        self.field = field
        self.perm = MonolithM31()

    def max_constraint_degree(self):
        return 3

    def _mds(self, state):
        w = WIDTH
        return [
            sum(
                (state[j] * int(MDS_ROW_16[(j - i) % w]) for j in range(w)),
                start=state[i] * 0,
            )
            for i in range(w)
        ]

    def eval(self, b):
        cols = b.main.local

        def bits_of(r, bar):
            o = _bits_off(r, bar)
            return cols[o : o + FIELD_BITS]

        def chi_of(r, bar):
            o = _chi_off(r, bar)
            return cols[o : o + N_CHI]

        def mflags_of(r, bar):
            o = _mflag_off(r, bar)
            return cols[o : o + N_MFLAGS]

        def lane_stack(per_lane):
            k = len(per_lane[0])
            return [
                stack_syms([lane[j] for lane in per_lane])
                for j in range(k)
            ]

        # running input state per round (exprs for r=0, columns after)
        inputs = [cols[OFF_INPUTS + i] for i in range(WIDTH)]
        round_inputs = [self._mds(inputs)]
        for r in range(N_ROUNDS):
            round_inputs.append(
                [cols[_post_off(r) + i] for i in range(WIDTH)]
            )

        # ---- Bars: 48 stacked (round, bar) lanes ----
        lanes = []
        for r in range(N_ROUNDS + 1):
            for bar in range(N_BARS):
                lanes.append(dict(
                    bits=bits_of(r, bar),
                    chi=chi_of(r, bar),
                    mflags=mflags_of(r, bar),
                    out=[cols[_barout_off(r) + bar]],
                    state=[round_inputs[r][bar]],
                ))
        L = len(lanes)
        bits = lane_stack([ln["bits"] for ln in lanes])
        chi = lane_stack([ln["chi"] for ln in lanes])
        mflags = lane_stack([ln["mflags"] for ln in lanes])
        bar_out = lane_stack([ln["out"] for ln in lanes])[0]
        state_in = lane_stack([ln["state"] for ln in lanes])[0]

        bools = stack_syms(bits)
        b.assert_zero_block(bools * (bools - 1), FIELD_BITS * L)
        b.assert_zero_block(_pack(bits) - state_in, L)

        # chi witnesses + S-box recombination (air.rs:567-636)
        result = None
        bit_off = 0
        chi_off = 0
        for limb_idx, n in enumerate(LIMB_BITS):
            x = bits[bit_off : bit_off + n]

            def sub(base, k, n=n):
                return (base + n - (k % n)) % n

            if n < 8:
                out_bits = []
                for j in range(n):
                    andn = (1 - x[sub(j, 2)]) * x[sub(j, 3)]
                    xj = x[sub(j, 1)]
                    out_bits.append(xj + andn - 2 * (xj * andn))
                limb = _pack(out_bits)
            else:
                cx = chi[chi_off : chi_off + n]
                binds = []
                for j in range(n):
                    andn = (1 - x[sub(j, 2)]) * x[sub(j, 3)]
                    binds.append(cx[j] - andn * x[sub(j, 4)])
                b.assert_zero_block(stack_syms(binds), n * L)
                out_bits = []
                for j in range(n):
                    xj = x[sub(j, 1)]
                    out_bits.append(xj + cx[j] - 2 * (xj * cx[j]))
                limb = _pack(out_bits)
                chi_off += n
            shifted = limb * ((1 << bit_off) % P)
            result = shifted if result is None else result + shifted
            bit_off += n
        b.assert_zero_block(bar_out - result, L)

        # canonical-pattern walk (air.rs:482-525); M31: all bits one
        prev = None
        flag_idx = 0
        pending = None
        for i in range(FIELD_BITS - 1, -1, -1):
            x_i = bits[i]
            if pending is None:
                pending = x_i
            else:
                m_i = mflags[flag_idx]
                expr = (
                    m_i - pending * x_i
                    if prev is None
                    else m_i - prev * pending * x_i
                )
                b.assert_zero_block(expr, L)
                prev = m_i
                pending = None
                flag_idx += 1
        assert flag_idx == N_MFLAGS
        # odd Hamming weight: final bit 0 folds into the closing check
        closing = prev * pending if pending is not None else prev
        b.assert_zero_block(closing, L)

        # ---- round bindings: 6 stacked lanes ----
        post_lanes = []
        for r in range(N_ROUNDS + 1):
            st = list(round_inputs[r])
            for bar in range(N_BARS):
                st[bar] = cols[_barout_off(r) + bar]
            post_lanes.append(dict(
                bars=st,
                post=[cols[_post_off(r) + i] for i in range(WIDTH)],
            ))
        bars_s = lane_stack([ln["bars"] for ln in post_lanes])
        post_s = lane_stack([ln["post"] for ln in post_lanes])
        bricks = [bars_s[0]]
        for i in range(1, WIDTH):
            bricks.append(bars_s[i] + bars_s[i - 1] * bars_s[i - 1])
        concrete = self._mds(bricks)
        # round constants: rows for the 5 full rounds, zeros for final
        rc = self.perm.rc
        R = N_ROUNDS + 1
        for i in range(WIDTH):
            rc_col = Sym(
                b.backend,
                b.backend.const_vec(
                    [int(rc[r][i]) if r < N_ROUNDS else 0
                     for r in range(R)]
                ),
            )
            b.assert_zero_block(
                concrete[i] + rc_col - post_s[i], R
            )


# ---------------------------------------------------------------------------
# trace generation (vectorized over rows)
# ---------------------------------------------------------------------------
def generate_monolith_trace(F, inputs: np.ndarray) -> np.ndarray:
    """inputs: (n, 16) uint32 < P. Returns (n, 3520) std uint32 trace."""
    perm = MonolithM31()
    n = inputs.shape[0]
    assert n & (n - 1) == 0
    x = np.asarray(inputs, dtype=np.uint64) % P
    tr = np.zeros((n, NUM_MONOLITH_COLS), dtype=np.uint32)
    tr[:, :WIDTH] = x.astype(np.uint32)

    mds = np.array(
        [
            [int(MDS_ROW_16[(j - i) % WIDTH]) for j in range(WIDTH)]
            for i in range(WIDTH)
        ],
        dtype=np.uint64,
    )

    def concrete(v):
        return ((v[:, None, :] * mds[None]) % P).sum(axis=-1) % P

    state = concrete(x)
    from ..hashes.monolith import _HIGH15, _LOW16

    for r in range(N_ROUNDS + 1):
        # bars: record bits, chi products, mflags, outputs
        for bar in range(N_BARS):
            v = state[:, bar].astype(np.uint32)
            for z in range(FIELD_BITS):
                tr[:, _bits_off(r, bar) + z] = (v >> np.uint32(z)) & 1
            bits = [
                ((v >> np.uint32(z)) & 1).astype(np.uint64)
                for z in range(FIELD_BITS)
            ]
            # chi products for the three 8-bit limbs
            ci = 0
            bo = 0
            for n_l in LIMB_BITS:
                if n_l < 8:
                    break
                for j in range(n_l):
                    sub = lambda base, k: (base + n_l - (k % n_l)) % n_l
                    c = (
                        (1 - bits[bo + sub(j, 2)])
                        * bits[bo + sub(j, 3)]
                        * bits[bo + sub(j, 4)]
                    )
                    tr[:, _chi_off(r, bar) + ci] = c.astype(np.uint32)
                    ci += 1
                bo += n_l
            # match flags: MSB-to-LSB pairs
            prev = np.ones(n, dtype=np.uint64)
            fi = 0
            pending = None
            for i in range(FIELD_BITS - 1, -1, -1):
                if pending is None:
                    pending = bits[i]
                else:
                    m = prev * pending * bits[i]
                    tr[:, _mflag_off(r, bar) + fi] = m.astype(np.uint32)
                    prev = m
                    pending = None
                    fi += 1
            # bar output
            lo = _LOW16[v & 0xFFFF]
            hi = _HIGH15[v >> 16]
            out = ((hi.astype(np.uint64) << 16) | lo).astype(np.uint64)
            tr[:, _barout_off(r) + bar] = out.astype(np.uint32)
            state[:, bar] = out
        # bricks
        for i in range(WIDTH - 1, 0, -1):
            state[:, i] = (
                state[:, i] + state[:, i - 1] * state[:, i - 1]
            ) % P
        # concrete + rc
        state = concrete(state)
        if r < N_ROUNDS:
            state = (
                state + np.array(perm.rc[r], dtype=np.uint64)
            ) % P
        tr[:, _post_off(r) : _post_off(r) + WIDTH] = state.astype(
            np.uint32
        )
    return tr
