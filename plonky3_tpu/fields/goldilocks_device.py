"""Goldilocks device kernels — u32 limb pairs on the VPU.

The reference makes Goldilocks a first-class fast field with NEON
inline-asm Poseidon kernels (goldilocks/src/aarch64_neon/
poseidon2_asm.rs). TPUs have no 64-bit integer lanes, so a field element
is a (lo, hi) pair of uint32 arrays; multiplication builds the 128-bit
product from four 32x32 partials and reduces with the NEG_ORDER
identity 2^64 ≡ 2^32 − 1 (mod P), 2^96 ≡ −1 (goldilocks.rs:102).

All values are kept canonical (< P) between ops. Includes the batched
device Poseidon2-Goldilocks width-8 permutation (S-box x^7, 4+4 full +
22 partial rounds) in lockstep with the host implementation in
hashes/poseidon2_goldilocks.py, and a device Merkle commit over it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .goldilocks import Goldilocks
from .monty31 import _mul_hi_lo

_P_LO = jnp.uint32(0x00000001)
_P_HI = jnp.uint32(0xFFFFFFFF)
_NEG_ORDER = jnp.uint32(0xFFFFFFFF)  # 2^64 mod P = 2^32 - 1
_P = Goldilocks.P


def split_np(x64: np.ndarray):
    """Host u64 array -> (lo, hi) u32 arrays."""
    x64 = np.asarray(x64, np.uint64)
    return (
        (x64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (x64 >> np.uint64(32)).astype(np.uint32),
    )


def join_np(lo, hi):
    return np.asarray(lo, np.uint64) | (
        np.asarray(hi, np.uint64) << np.uint64(32)
    )


def _geq_p(lo, hi):
    """(lo, hi) >= P, canonical-range inputs assumed < 2^64."""
    return (hi == _P_HI) & (lo >= _P_LO)


def _cond_sub_p(lo, hi):
    """Subtract P once when >= P (result stays < P for inputs < 2P)."""
    take = _geq_p(lo, hi)
    # (lo, hi) - (1, 0xFFFFFFFF): borrow from lo iff lo == 0
    lo2 = lo - _P_LO
    borrow = (lo < _P_LO).astype(jnp.uint32)
    hi2 = hi - _P_HI - borrow
    return jnp.where(take, lo2, lo), jnp.where(take, hi2, hi)


def add(a, b):
    """(a + b) mod P for canonical pairs."""
    al, ah = a
    bl, bh = b
    sl = al + bl
    c = (sl < al).astype(jnp.uint32)
    s1 = ah + bh
    o1 = s1 < ah
    sh = s1 + c
    o2 = sh < s1
    o = o1 | o2  # carry out of 2^64
    # fold 2^64 ≡ NEG_ORDER: add (NEG_ORDER, 0); cannot overflow again
    sl2 = sl + _NEG_ORDER
    c2 = (sl2 < sl).astype(jnp.uint32)
    sh2 = sh + c2
    lo = jnp.where(o, sl2, sl)
    hi = jnp.where(o, sh2, sh)
    return _cond_sub_p(lo, hi)


def sub(a, b):
    al, ah = a
    bl, bh = b
    dl = al - bl
    brw = (al < bl).astype(jnp.uint32)
    d1 = ah - bh
    u1 = ah < bh
    dh = d1 - brw
    u2 = d1 < brw
    under = u1 | u2
    # fold -2^64 ≡ -NEG_ORDER: subtract (NEG_ORDER, 0); no second borrow
    dl2 = dl - _NEG_ORDER
    brw2 = (dl < _NEG_ORDER).astype(jnp.uint32)
    dh2 = dh - brw2
    return (
        jnp.where(under, dl2, dl),
        jnp.where(under, dh2, dh),
    )


def neg(a):
    al, ah = a
    z = (al == 0) & (ah == 0)
    rl = _P_LO - al
    brw = (al > _P_LO).astype(jnp.uint32)
    rh = _P_HI - ah - brw
    return jnp.where(z, al, rl), jnp.where(z, ah, rh)


def _add3_32(a, b, c):
    """a + b + c of u32 -> (sum_u32, carry in 0..2)."""
    s = a + b
    c1 = (s < a).astype(jnp.uint32)
    s2 = s + c
    c2 = (s2 < s).astype(jnp.uint32)
    return s2, c1 + c2


def mul(a, b):
    """(a·b) mod P, canonical output."""
    al, ah = a
    bl, bh = b
    ll_hi, ll_lo = _mul_hi_lo(al, bl)
    lh_hi, lh_lo = _mul_hi_lo(al, bh)
    hl_hi, hl_lo = _mul_hi_lo(ah, bl)
    hh_hi, hh_lo = _mul_hi_lo(ah, bh)
    # 128-bit product words w0..w3 (low to high)
    w0 = ll_lo
    w1, c1 = _add3_32(ll_hi, lh_lo, hl_lo)
    w2a, c2a = _add3_32(lh_hi, hl_hi, hh_lo)
    w2 = w2a + c1
    c2b = (w2 < w2a).astype(jnp.uint32)
    w3 = hh_hi + c2a + c2b  # cannot overflow: product < 2^128

    # reduce128 ((w3,w2), (w1,w0)) — plonky2-style NEG_ORDER reduction:
    # t0 = lo64 - hi_hi(=w3); borrow -> t0 -= NEG_ORDER
    t0l = w0 - w3
    b0 = (w0 < w3).astype(jnp.uint32)
    t0h = w1 - b0
    under = (w1 == 0) & (b0 == 1)
    t0l2 = t0l - _NEG_ORDER
    b1 = (t0l < _NEG_ORDER).astype(jnp.uint32)
    t0h2 = t0h - b1
    t0l = jnp.where(under, t0l2, t0l)
    t0h = jnp.where(under, t0h2, t0h)
    # t1 = hi_lo(=w2) * NEG_ORDER = (w2 << 32) - w2
    t1l = jnp.uint32(0) - w2
    t1b = (w2 != 0).astype(jnp.uint32)
    t1h = w2 - t1b
    # t2 = t0 + t1; carry -> t2 += NEG_ORDER
    rl = t0l + t1l
    ca = (rl < t0l).astype(jnp.uint32)
    rh0 = t0h + t1h
    cb = (rh0 < t0h).astype(jnp.uint32)
    rh = rh0 + ca
    cc = (rh < rh0).astype(jnp.uint32)
    over = (cb + cc) > 0
    rl2 = rl + _NEG_ORDER
    c3 = (rl2 < rl).astype(jnp.uint32)
    rh2 = rh + c3
    lo = jnp.where(over, rl2, rl)
    hi = jnp.where(over, rh2, rh)
    return _cond_sub_p(lo, hi)


def square(a):
    return mul(a, a)


def const(x64: int):
    x64 %= _P
    return (
        jnp.uint32(x64 & 0xFFFFFFFF),
        jnp.uint32(x64 >> 32),
    )


def double(a):
    return add(a, a)


# ---------------------------------------------------------------------------
# batched Poseidon2-Goldilocks width-8 (device, lane-vectorized: the
# S-box runs on the whole (..., 8) lane axis at once so the traced
# graph stays ~30 mul-kernels deep instead of 8x that)
# ---------------------------------------------------------------------------
def _sbox7(x):
    x2 = square(x)
    x4 = square(x2)
    return mul(mul(x4, x2), x)


def _consts_vec(vals):
    lo = np.asarray([v & 0xFFFFFFFF for v in vals], np.uint32)
    hi = np.asarray([v >> 32 for v in vals], np.uint32)
    return jnp.asarray(lo), jnp.asarray(hi)


def _mds_light_vec(s):
    """Width-8 external layer on (..., 8) lane-vectorized pairs."""

    def lanes(p, idx):
        return (p[0][..., idx], p[1][..., idx])

    def mat4(x):  # x: pair with last dim 4
        x0, x1 = lanes(x, slice(0, 1)), lanes(x, slice(1, 2))
        x2, x3 = lanes(x, slice(2, 3)), lanes(x, slice(3, 4))
        t01 = add(x0, x1)
        t23 = add(x2, x3)
        t0123 = add(t01, t23)
        t01123 = add(t0123, x1)
        t01233 = add(t0123, x3)
        o0 = add(t01123, t01)
        o1 = add(t01123, double(x2))
        o2 = add(t01233, t23)
        o3 = add(t01233, double(x0))
        return (
            jnp.concatenate([o0[0], o1[0], o2[0], o3[0]], axis=-1),
            jnp.concatenate([o0[1], o1[1], o2[1], o3[1]], axis=-1),
        )

    a = mat4(lanes(s, slice(0, 4)))
    b = mat4(lanes(s, slice(4, 8)))
    tot = add(a, b)
    left = add(a, tot)
    right = add(b, tot)
    return (
        jnp.concatenate([left[0], right[0]], axis=-1),
        jnp.concatenate([left[1], right[1]], axis=-1),
    )


def poseidon2_goldilocks_device(states):
    """Batched permutation: states = (lo, hi) arrays of shape (..., 8).
    Returns the permuted (lo, hi) pair (lockstep with
    hashes/poseidon2_goldilocks.py)."""
    from ..hashes.constants.poseidon2_goldilocks_constants import (
        MATRIX_DIAG_8,
        RC8_EXTERNAL_FINAL,
        RC8_EXTERNAL_INITIAL,
        RC8_INTERNAL,
    )

    s = states
    diag = _consts_vec(MATRIX_DIAG_8)

    def rc_stack(rcs):
        lo = np.asarray(
            [[v & 0xFFFFFFFF for v in rc] for rc in rcs], np.uint32
        )
        hi = np.asarray([[v >> 32 for v in rc] for rc in rcs], np.uint32)
        return jnp.asarray(lo), jnp.asarray(hi)

    def full_round(s, rc):
        s = _sbox7(add(s, rc))
        return _mds_light_vec(s), None

    def internal_round(s, rc):
        lane0 = (s[0][..., :1], s[1][..., :1])
        lane0 = _sbox7(add(lane0, (rc[0], rc[1])))
        s = (
            jnp.concatenate([lane0[0], s[0][..., 1:]], axis=-1),
            jnp.concatenate([lane0[1], s[1][..., 1:]], axis=-1),
        )
        # total = sum of lanes (log-tree of 64-bit adds)
        t4 = add(
            (s[0][..., :4], s[1][..., :4]),
            (s[0][..., 4:], s[1][..., 4:]),
        )
        t2 = add(
            (t4[0][..., :2], t4[1][..., :2]),
            (t4[0][..., 2:], t4[1][..., 2:]),
        )
        t1 = add(
            (t2[0][..., :1], t2[1][..., :1]),
            (t2[0][..., 1:], t2[1][..., 1:]),
        )
        total = (
            jnp.broadcast_to(t1[0], s[0].shape),
            jnp.broadcast_to(t1[1], s[1].shape),
        )
        return add(total, mul(diag, s)), None

    s = _mds_light_vec(s)
    s, _ = jax.lax.scan(full_round, s, rc_stack(RC8_EXTERNAL_INITIAL))
    rc_int = (
        jnp.asarray(
            [[v & 0xFFFFFFFF] for v in RC8_INTERNAL], np.uint32
        ),
        jnp.asarray([[v >> 32] for v in RC8_INTERNAL], np.uint32),
    )
    s, _ = jax.lax.scan(
        internal_round, s, (rc_int[0], rc_int[1])
    )
    s, _ = jax.lax.scan(full_round, s, rc_stack(RC8_EXTERNAL_FINAL))
    return s


_PERM_JIT = jax.jit(poseidon2_goldilocks_device)


def _merkle_layers_device(lo, hi):
    """Device Goldilocks Merkle commit of an (h, 8) matrix: leaf = one
    permutation of the row (digest = first 4 lanes), then 2-to-1
    truncated-permutation compression per level (eager ladder; the
    jitted permutation is shape-cached per level)."""
    plo, phi = _PERM_JIT((lo, hi))
    layer = (plo[:, :4], phi[:, :4])
    layers = [layer]
    while layer[0].shape[0] > 1:
        ll, lh = layer
        cat_lo = jnp.concatenate([ll[0::2], ll[1::2]], axis=1)
        cat_hi = jnp.concatenate([lh[0::2], lh[1::2]], axis=1)
        plo, phi = _PERM_JIT((cat_lo, cat_hi))
        layer = (plo[:, :4], phi[:, :4])
        layers.append(layer)
    return layers


def gl_merkle_commit_device(mat64: np.ndarray):
    """(h, 8) host u64 matrix -> root digest (4 canonical u64 ints)."""
    lo, hi = split_np(mat64)
    layers = _merkle_layers_device(jnp.asarray(lo), jnp.asarray(hi))
    rl, rh = layers[-1]
    return tuple(
        int(v) for v in join_np(np.asarray(rl[0]), np.asarray(rh[0]))
    )
