"""Radix-2 NTT / coset LDE over two-adic Monty-31 fields, XLA-first.

Re-design of the reference's DFT layer (`dft/src/traits.rs:28`,
`dft/src/radix_2_dit_parallel.rs`, `monty-31/src/dft/mod.rs:75`) for TPU:

* Transforms run along axis 0 of a row-major matrix (rows = evaluations of
  each column-polynomial), batched over all trailing axes.
* Forward transform is decimation-in-frequency (DIF): natural-order input,
  bit-reversed output — every stage is a static slice + butterfly + concat,
  which XLA vectorizes over the VPU with zero gathers. The bit-reversal
  permutation, where needed, is a reshape/transpose (utils.bits), never a
  gather.
* `coset_lde_batch` fuses: inverse-DIF -> (bitrev) -> scale-by-shift-powers
  (with n^-1 folded in) -> zero-pad -> forward DIF, mirroring the semantics
  of `coset_lde_batch_with_transform` (`dft/src/traits.rs:227-242`) and the
  fused shift-scale of `monty-31/src/dft/mod.rs:25`. Output rows are in
  bit-reversed order — exactly the layout `TwoAdicFriPcs::commit` stores
  (`fri/src/two_adic_pcs.rs:300,320`), making FRI folds adjacent-pair
  reshapes.
* Twiddle stacks are cached per (field, log_n, direction), the TPU analog
  of the reference's `RwLock<BTreeMap>` twiddle caches
  (`radix_2_dit_parallel.rs:53-117`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.monty31 import Monty31
from ..utils.bits import bitrev_permute_axis0, log2_strict

# cache: (field name, log_n, inverse) -> device uint32 array of g^j, j<n/2
_TWIDDLE_CACHE: dict = {}
# cache: (field name, log_n, shift) -> device (n,) shift-power array
_POWER_CACHE: dict = {}


def powers_np(F: Monty31, base_std: int, n: int, scale_std: int = 1):
    """[s, s·b, ..., s·b^(n-1)] as HOST uint32 Monty array (log-doubling;
    exact uint64 modmul — products of 31-bit values fit in 64 bits)."""
    P = np.uint64(F.P)
    # work in standard form: modmul is a single uint64 expression
    p_std = np.array([scale_std % F.P], dtype=np.uint64)
    cur_std = np.uint64(base_std % F.P)
    while p_std.shape[0] < n:
        p_std = np.concatenate([p_std, (p_std * cur_std) % P])
        cur_std = (cur_std * cur_std) % P
    return F.to_monty_np(p_std[:n].astype(np.uint32))


def powers_std_np(F: Monty31, base_std: int, n: int, scale_std: int = 1):
    """[s, s·b, ...] as HOST uint32 STANDARD-form array (for the Shoup
    twiddle tables — see Monty31.mul_shoup)."""
    P = np.uint64(F.P)
    p_std = np.array([scale_std % F.P], dtype=np.uint64)
    cur_std = np.uint64(base_std % F.P)
    while p_std.shape[0] < n:
        p_std = np.concatenate([p_std, (p_std * cur_std) % P])
        cur_std = (cur_std * cur_std) % P
    return p_std[:n].astype(np.uint32)


def powers_device(F: Monty31, base_std: int, n: int, scale_std: int = 1):
    """Device constant of `powers_np` (safe to call under jit: values are
    computed host-side, so nothing traced ever reaches the caches)."""
    return jnp.asarray(powers_np(F, base_std, n, scale_std))


def _twiddles(F: Monty31, log_n: int, inverse: bool):
    key = (F.name, log_n, inverse)
    tw = _TWIDDLE_CACHE.get(key)
    if tw is None:
        g = F.two_adic_generator_h(log_n)
        if inverse:
            g = F.inv_h(g)
        tw = powers_np(F, g, max(1 << (log_n - 1), 1))
        _TWIDDLE_CACHE[key] = tw
    return jnp.asarray(tw)


def _shift_powers(F: Monty31, log_n: int, shift_std: int, scale_std: int):
    key = (F.name, log_n, shift_std, scale_std)
    p = _POWER_CACHE.get(key)
    if p is None:
        p = powers_np(F, shift_std, 1 << log_n, scale_std)
        _POWER_CACHE[key] = p
    return jnp.asarray(p)


def _use_pallas(x, log_n: int) -> bool:
    """Route to the pallas four-step kernels: large 2-D device arrays on
    TPU (narrow mats would pay 128-lane padding)."""
    return (
        x.ndim == 2
        and log_n >= 13
        and x.shape[1] >= 256
        and not isinstance(x, np.ndarray)
        and jax.default_backend() == "tpu"
    )


def _dif(F: Monty31, x, log_n: int, inverse: bool):
    """DIF butterfly network along axis 0: natural in, bit-reversed out.

    Stages run three-at-a-time as radix-8 bodies (identical arithmetic
    to three radix-2 stages, so the output is bit-for-bit unchanged):
    each fused body is one XLA pass, cutting full-array HBM round-trips
    by 3x — the network is bandwidth-bound at 2^18×1312.

    On TPU, large 2-D transforms route to the pallas four-step kernel
    pair in ntt_pallas.py (bit-identical output; two VMEM-resident
    sub-transforms via sublane rolls instead of ~log n HBM passes —
    24x faster at 2^18×1312)."""
    n = 1 << log_n
    if log_n == 0:
        return x
    if _use_pallas(x, log_n):
        from .ntt_pallas import dif_fused

        return dif_fused(F, x, log_n, inverse)
    tw_full = _twiddles(F, log_n, inverse)
    rest = x.shape[1:]
    bcast = (1,) * len(rest)
    x = x.reshape((1, n) + rest)
    s = 0
    while s < log_n:
        k = min(3, log_n - s)
        m = n >> s
        q = m >> k
        parts = [x[:, i * q : (i + 1) * q] for i in range(1 << k)]

        def rec(parts, d, s=s, q=q):
            if len(parts) == 1:
                return parts
            half = len(parts) // 2
            tw_vec = tw_full[:: 1 << (s + d)]
            tops, bots = [], []
            for j in range(half):
                t, u = parts[j], parts[j + half]
                tw = tw_vec[j * q : (j + 1) * q].reshape((1, q) + bcast)
                tops.append(F.add(t, u))
                bots.append(F.mul(F.sub(t, u), tw))
            return rec(tops, d + 1) + rec(bots, d + 1)

        x = jnp.concatenate(rec(parts, 0), axis=1).reshape(
            ((1 << (s + k)), q) + rest
        )
        s += k
    return x.reshape((n,) + rest)


def dft_natural_to_bitrev(F: Monty31, mat):
    """Forward DFT along axis 0; output rows in bit-reversed order."""
    return _dif(F, mat, log2_strict(mat.shape[0]), inverse=False)


def dft(F: Monty31, mat):
    """Forward DFT, natural order in and out (dft/src/traits.rs:53)."""
    out = dft_natural_to_bitrev(F, mat)
    return bitrev_permute_axis0(out, log2_strict(mat.shape[0]))


def idft(F: Monty31, mat):
    """Inverse DFT, natural order in and out (dft/src/traits.rs:150)."""
    log_n = log2_strict(mat.shape[0])
    out = _dif(F, mat, log_n, inverse=True)
    out = bitrev_permute_axis0(out, log_n)
    inv_n = F.const(F.inv_h(1 << log_n))
    return F.mul(out, inv_n)


@partial(
    jax.jit,
    static_argnames=("F", "added_bits", "shift_std", "out_order",
                     "with_coeffs"),
)
def coset_lde_batch(
    F: Monty31, mat, added_bits: int, shift_std: int,
    out_order: str = "bitrev", with_coeffs: bool = False,
):
    """Low-degree extension onto the coset `shift·K`, |K| = n·2^added_bits.

    Semantics of `TwoAdicSubgroupDft::coset_lde_batch`
    (`dft/src/traits.rs:227`): interpolate `mat` over the subgroup H (natural
    order), evaluate on the shifted larger domain. Output order is
    'bitrev' (FRI-commit layout) or 'natural'.
    """
    log_n = log2_strict(mat.shape[0])
    log_N = log_n + added_bits
    n, N = 1 << log_n, 1 << log_N

    # 1) inverse DIF: natural evals -> bit-reversed coeffs (unscaled by 1/n)
    coeffs_br = _dif(F, mat, log_n, inverse=True)
    # 2) back to natural coefficient order (reshape/transpose pass)
    coeffs = bitrev_permute_axis0(coeffs_br, log_n)
    # 3) scale coeff_i by shift^i, folding in the deferred n^-1
    sp = _shift_powers(F, log_n, shift_std, F.inv_h(n))
    coeffs = F.mul(coeffs, sp.reshape((n,) + (1,) * (mat.ndim - 1)))
    # 4+5) zero-pad to degree bound N and forward DIF (natural coeffs ->
    # bit-reversed evals on shift·K). On the pallas path the last padding
    # doubling stays implicit (zero_top): the kernel synthesizes the
    # degenerate first stage instead of reading a half-zero array.
    if _use_pallas(x=mat, log_n=log_N):
        from .ntt_pallas import dif_fused

        half = N >> 1
        if n < half:
            padded = jnp.concatenate(
                [coeffs, jnp.zeros((half - n,) + mat.shape[1:],
                                   jnp.uint32)], axis=0
            )
        else:
            padded = coeffs
        out = dif_fused(F, padded, log_N, inverse=False, zero_top=True)
    else:
        pad = jnp.zeros((N - n,) + mat.shape[1:], jnp.uint32)
        out = _dif(F, jnp.concatenate([coeffs, pad], axis=0), log_N,
                   inverse=False)
    if out_order == "natural":
        out = bitrev_permute_axis0(out, log_N)
    if with_coeffs:
        # scaled coefficients a_i = c_i·shift^i of the interpolant
        # (p(z) = Σ a_i·(z/shift)^i) — kept by the PCS so opening at ζ
        # is one MXU dot instead of a barycentric pass over the LDE
        return out, coeffs[:n]
    return out


def eval_coeffs_at_point_ext(E, F: Monty31, coeffs, z_powers):
    """Evaluate base-coefficient columns at an extension point.

    coeffs: (n, w) base matrix (natural coefficient order);
    z_powers: (n, D) extension powers [1, z, z^2, ...].
    Returns (w, D): per-column p_j(z) = sum_i c_ij z^i.

    This replaces the reference's barycentric evaluation over LDE rows
    (`matrix/src/interpolation.rs:78`) — same polynomial, evaluated from
    coefficients, exact field math so protocol-visible values agree.
    """
    # (n, w, 1) * (n, 1, D) -> sum over n
    prods = F.mul(coeffs[:, :, None], z_powers[:, None, :])
    return F.sum(prods, axis=0)


def coset_evals_from_coeffs(F: Monty31, coeffs, added_bits: int, shift_std: int):
    """Evaluate the polynomial with coefficient matrix `coeffs` (natural
    order, (m, w) device monty) over the coset shift·K,
    |K| = m·2^added_bits; output bit-reversed rows.

    The forward half of `coset_lde_batch` without the interpolation pass
    (the caller already has coefficients — WHIR/STIR commit path)."""
    log_m = log2_strict(coeffs.shape[0])
    log_N = log_m + added_bits
    m, N = 1 << log_m, 1 << log_N
    sp = _shift_powers(F, log_m, shift_std, 1)
    scaled = F.mul(coeffs, sp.reshape((m,) + (1,) * (coeffs.ndim - 1)))
    pad = jnp.zeros((N - m,) + coeffs.shape[1:], jnp.uint32)
    return _dif(F, jnp.concatenate([scaled, pad], axis=0), log_N,
                inverse=False)
