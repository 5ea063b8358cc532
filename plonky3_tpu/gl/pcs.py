"""Goldilocks TwoAdicFriPcs — device LDE/commit/open over limb pairs.

The GL realization of `fri/src/two_adic_pcs.rs` (see fri/two_adic_pcs.py
for the Monty-31 engine and the algebra citations): commit = fused coset
LDE (bitrev rows) + Poseidon2-GL Merkle; open = coefficient-dot ys at ζ
plus alpha-batched reduced-opening accumulation, both as device pair
kernels; the FRI tail reuses the generic prove_fri/verify_fri protocol
drivers with a GL folding strategy (fold over GL2 = GL[X]/(X^2-7)).
Wire form everywhere at the protocol boundary: interleaved-limb u32
arrays / canonical u64 ints (gl/field.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..commit.domain import TwoAdicCoset
from ..fields import goldilocks_device as gd
from ..fields.goldilocks import Goldilocks
from ..fri.config import FriParameters
from ..fri.proof import BatchMultiOpening
from ..fri.prover import prove_fri
from ..fri.verifier import FriError, verify_fri
from ..merkle.extension_mmcs import ExtensionMmcs
from ..utils.bits import bitrev_permute_axis0, log2_strict, reverse_bits_len
from .field import (
    GLE,
    GLF,
    depair,
    ext_add,
    ext_base_mul,
    ext_inv_device,
    ext_mul,
    ext_sub,
    halve,
    join_host,
    powers_host,
    powers_pair_device,
    repair,
    split_host,
    sum_axis,
)
from .ntt import gl_coset_lde_batch, gl_idft

_P = Goldilocks.P


# ---------------------------------------------------------------------------
# host exact helpers
# ---------------------------------------------------------------------------
def gl_inv_np(x64: np.ndarray) -> np.ndarray:
    """Vectorized x^(P-2) with exact u64 limb numpy muls."""
    e = _P - 2
    acc = None
    base = np.asarray(x64, np.uint64)
    while e:
        if e & 1:
            acc = base if acc is None else Goldilocks.mul_np(acc, base)
        e >>= 1
        if e:
            base = Goldilocks.mul_np(base, base)
    return acc


def _gl_dot_np(rows64, w64):
    """Σ_j rows[., j]·w[j] mod P — log-tree reduction, exact."""
    prod = Goldilocks.mul_np(rows64, w64[None, :])
    n = prod.shape[1]
    while n > 1:
        half = n // 2
        odd = n - 2 * half
        s = Goldilocks.add_np(prod[:, :half], prod[:, half : 2 * half])
        prod = (
            np.concatenate([s, prod[:, 2 * half :]], axis=1) if odd else s
        )
        n = half + odd
    return prod[:, 0]


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("log_n",))
def _ext_powers_pairs(z_wire, log_n: int):
    """[1, z, ..., z^{n-1}] as ext-of-pairs device arrays of shape (n,).

    z: traced (4,) wire element (so the compile caches per log_n, not
    per opening point). Log-doubling: p_{k..2k} = p_{0..k}·z^k.
    """
    c0 = (jnp.uint32(1).reshape(1), jnp.uint32(0).reshape(1))
    c1 = (jnp.uint32(0).reshape(1), jnp.uint32(0).reshape(1))
    p = (c0, c1)
    zk = ((z_wire[0:1], z_wire[1:2]), (z_wire[2:3], z_wire[3:4]))
    for _ in range(log_n):
        hi_part = ext_mul(p, zk)
        p = (
            (
                jnp.concatenate([p[0][0], hi_part[0][0]]),
                jnp.concatenate([p[0][1], hi_part[0][1]]),
            ),
            (
                jnp.concatenate([p[1][0], hi_part[1][0]]),
                jnp.concatenate([p[1][1], hi_part[1][1]]),
            ),
        )
        zk = ext_mul(zk, zk)
    return p


@jax.jit
def _gl_ys_kernel(coeffs_lo, coeffs_hi, zp):
    """ys_j = Σ_i c_ij·z^i for every column j.

    coeffs: (n, w) pair; zp: ext-of-pairs (n,). Returns wire (w, 4)."""
    c = (coeffs_lo, coeffs_hi)
    out = []
    for d in range(2):
        zd = (zp[d][0][:, None], zp[d][1][:, None])
        s = sum_axis(gd.mul(c, zd), axis=0)  # (w,) pair
        out.extend(s)
    lo0, hi0, lo1, hi1 = out[0], out[1], out[2], out[3]
    return jnp.stack([lo0, hi0, lo1, hi1], axis=-1)


@jax.jit
def _gl_mred_kernel(mat_lo, mat_hi, ap):
    """Mred(x) = Σ_j α^j·m[x, j] — ap: (w, 4) wire alpha powers.
    Returns ext-of-pairs arrays of shape (h,)."""
    m = (mat_lo, mat_hi)  # (h, w)
    coords = []
    for d in range(2):
        w_pair = (ap[None, :, 2 * d], ap[None, :, 2 * d + 1])
        coords.append(sum_axis(gd.mul(m, w_pair), axis=1))
    return coords[0], coords[1]


@jax.jit
def _gl_inv_denom_kernel(z_wire, xs_lo, xs_hi):
    """1/(z - x) for base points x (pairs); z: (4,) wire. Ext-of-pairs."""
    z = ((z_wire[0], z_wire[1]), (z_wire[2], z_wire[3]))
    x_ext = ((xs_lo, xs_hi), (jnp.zeros_like(xs_lo), jnp.zeros_like(xs_hi)))
    d = ext_sub(
        (
            (jnp.broadcast_to(z[0][0], xs_lo.shape),
             jnp.broadcast_to(z[0][1], xs_lo.shape)),
            (jnp.broadcast_to(z[1][0], xs_lo.shape),
             jnp.broadcast_to(z[1][1], xs_lo.shape)),
        ),
        x_ext,
    )
    return ext_inv_device(d)


@jax.jit
def _gl_accum_kernel(acc, mred_z_wire, mred_x0_lo, mred_x0_hi,
                     mred_x1_lo, mred_x1_hi, invd_wire, alpha_off_wire):
    """acc += α_off·(Mred(z) - Mred(x))/(z - x) over the full height.

    acc: wire (h, 4); mred_x coords as pairs (h,); invd precomputed
    1/(z-x) wire (h, 4); α_off/mred_z: wire (4,)."""
    mz = ((mred_z_wire[0], mred_z_wire[1]),
          (mred_z_wire[2], mred_z_wire[3]))
    mx = ((mred_x0_lo, mred_x0_hi), (mred_x1_lo, mred_x1_hi))
    h = mred_x0_lo.shape[0]
    mzb = tuple(
        (jnp.broadcast_to(c[0], (h,)), jnp.broadcast_to(c[1], (h,)))
        for c in mz
    )
    diff = ext_sub(mzb, mx)
    lo32, hi32 = depair(invd_wire)  # (h, 2)
    invd = ((lo32[:, 0], hi32[:, 0]), (lo32[:, 1], hi32[:, 1]))
    quot = ext_mul(diff, invd)
    ao = ((alpha_off_wire[0], alpha_off_wire[1]),
          (alpha_off_wire[2], alpha_off_wire[3]))
    aob = tuple(
        (jnp.broadcast_to(c[0], (h,)), jnp.broadcast_to(c[1], (h,)))
        for c in ao
    )
    term = ext_mul(aob, quot)
    alo, ahi = depair(acc)
    a = ((alo[:, 0], ahi[:, 0]), (alo[:, 1], ahi[:, 1]))
    r = ext_add(a, term)
    return jnp.stack([r[0][0], r[0][1], r[1][0], r[1][1]], axis=-1)


# ---------------------------------------------------------------------------
# FRI folding strategy over GL2
# ---------------------------------------------------------------------------
@jax.jit
def _gl_fold_step_jit(folded_wire, beta_wire, hip_lo, hip_hi):
    h2 = folded_wire.shape[0]
    h = h2 // 2
    lo32, hi32 = depair(folded_wire)  # (h2, 2)
    lo32 = lo32.reshape(h, 2, 2)
    hi32 = hi32.reshape(h, 2, 2)
    e = ((lo32[:, 0, 0], hi32[:, 0, 0]), (lo32[:, 0, 1], hi32[:, 0, 1]))
    o = ((lo32[:, 1, 0], hi32[:, 1, 0]), (lo32[:, 1, 1], hi32[:, 1, 1]))
    even = tuple(halve(gd.add(ec, oc)) for ec, oc in zip(e, o))
    beta = ((beta_wire[0], beta_wire[1]), (beta_wire[2], beta_wire[3]))
    bb = tuple(
        (jnp.broadcast_to(c[0], (h,)), jnp.broadcast_to(c[1], (h,)))
        for c in beta
    )
    odd = ext_mul(ext_sub(e, o), bb)
    res = ext_add(even, ext_base_mul((hip_lo, hip_hi), odd))
    return jnp.stack(
        [res[0][0], res[0][1], res[1][0], res[1][1]], axis=-1
    )


def _hip_pairs(log_h: int):
    """bitrev([g^{-i}/2]) base pairs, g = two_adic_gen(log_h+1)."""
    g_inv = Goldilocks.inv_h(Goldilocks.two_adic_generator_h(log_h + 1))
    lo, hi = powers_pair_device(
        g_inv, 1 << log_h, scale=Goldilocks.inv_h(2)
    )
    return (
        bitrev_permute_axis0(lo, log_h),
        bitrev_permute_axis0(hi, log_h),
    )


class GLFriFolding:
    """Two-adic FRI folding over GL2 wire codewords (fri/prover.py
    TwoAdicFriFolding semantics)."""

    extra_query_index_bits = 0
    observe_arity_schedule = True
    scale_roll_in = True

    def __init__(self, E=GLE):
        self.E = E

    def fold_matrix(self, folded, beta, log_arity):
        b = beta
        for _ in range(log_arity):
            folded = self._fold_step(folded, b)
            b = GLE.mul_h(b, b)
        return folded

    def _fold_step(self, folded, beta):
        h = folded.shape[0] // 2
        log_h = log2_strict(h)
        if isinstance(folded, np.ndarray):
            return self._fold_step_np(folded, beta, log_h)
        hip_lo, hip_hi = _hip_pairs(log_h)
        return _gl_fold_step_jit(
            folded, jnp.asarray(GLE.to_monty_np(beta)), hip_lo, hip_hi
        )

    @staticmethod
    def _fold_step_np(folded, beta, log_h):
        from ..utils.bits import bitrev_indices

        G = Goldilocks
        vals = join_host(folded).reshape(-1, 2, 2)  # (h, {even,odd}, D)
        e, o = vals[:, 0], vals[:, 1]
        inv2 = np.uint64(G.inv_h(2))
        even = np.stack(
            [G.mul_np(G.add_np(e[:, d], o[:, d]), inv2) for d in range(2)],
            axis=-1,
        )
        diff = np.stack(
            [G.sub_np(e[:, d], o[:, d]) for d in range(2)], axis=-1
        )
        b0, b1 = np.uint64(beta[0]), np.uint64(beta[1])
        odd0 = G.add_np(
            G.mul_np(diff[:, 0], b0),
            G.mul_np(np.uint64(7), G.mul_np(diff[:, 1], b1)),
        )
        odd1 = G.add_np(
            G.mul_np(diff[:, 0], b1), G.mul_np(diff[:, 1], b0)
        )
        g_inv = G.inv_h(G.two_adic_generator_h(log_h + 1))
        hip = powers_host(g_inv, 1 << log_h, scale=G.inv_h(2))
        if log_h > 0:
            hip = hip[bitrev_indices(log_h)]
        res0 = G.add_np(even[:, 0], G.mul_np(hip, odd0))
        res1 = G.add_np(even[:, 1], G.mul_np(hip, odd1))
        return split_host(np.stack([res0, res1], axis=-1))

    @staticmethod
    def idft_final(final_evals):
        """Wire (L, 4) ext evals -> wire coefficients (iDFT per coord)."""
        out = gl_idft(depair(final_evals))
        return repair(*out)


# ---------------------------------------------------------------------------
# the PCS
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class GlTwoAdicFriPcs:
    fri: FriParameters
    mmcs: object  # GLMerkleTreeMmcs
    fri_mmcs: ExtensionMmcs  # ExtensionMmcs(inner=GL mmcs, D=2)
    F: object = GLF
    E: object = GLE

    supports_bitrev_evals = True

    def natural_domain_for_degree(self, degree: int) -> TwoAdicCoset:
        return TwoAdicCoset(GLF, 1, log2_strict(degree))

    def log_max_lde_height(self):
        return GLF.TWO_ADICITY

    # ------------------------------------------------------------------
    def commit(self, evaluations):
        """evaluations: [(TwoAdicCoset, wire (n, 2w) natural-order mat)]."""
        ldes, domains, coeffs = [], [], []
        for domain, evals in evaluations:
            assert evals.shape[0] == domain.size
            shift = Goldilocks.mul_h(
                GLF.GENERATOR, Goldilocks.inv_h(domain.shift)
            )
            lde, cf = gl_coset_lde_batch(
                depair(evals), self.fri.log_blowup, shift,
                with_coeffs=True,
            )
            ldes.append(repair(*lde))
            coeffs.append(cf)
            domains.append(domain)
        data = self.mmcs.commit(ldes)
        data.domains = domains
        data.coeffs = coeffs  # pair form (n, w)
        return data

    def get_evaluations_on_domain(self, data, mat_index: int,
                                  domain: TwoAdicCoset,
                                  order: str = "natural"):
        lde = data.matrices[mat_index]
        prefix = lde[: domain.size]
        if order == "bitrev":
            return prefix
        return bitrev_permute_axis0(prefix, domain.log_n)

    # ------------------------------------------------------------------
    def open(self, data_with_points, challenger, spans=None):
        lb = self.fri.log_blowup
        log_global_max_height = max(
            log2_strict(m.shape[0])
            for data, _ in data_with_points
            for m in data.matrices
        )

        # ys via coefficient dots (one kernel per (matrix, point))
        g_inv = Goldilocks.inv_h(GLF.GENERATOR)
        zpows = {}
        for data, points in data_with_points:
            for cf, pts in zip(data.coeffs, points):
                log_n = log2_strict(cf[0].shape[0])
                for z in pts:
                    key = (z, log_n)
                    if key not in zpows:
                        zg = GLE.base_mul_h(g_inv, z)
                        zpows[key] = _ext_powers_pairs(
                            jnp.asarray(GLE.to_monty_np(zg)), log_n
                        )
        ys_devs = []
        for data, points in data_with_points:
            for cf, pts in zip(data.coeffs, points):
                log_n = log2_strict(cf[0].shape[0])
                for z in pts:
                    ys_devs.append(
                        _gl_ys_kernel(cf[0], cf[1], zpows[(z, log_n)])
                    )

        from ..utils.transfer import pull_all

        ys_all = iter(pull_all(ys_devs))

        opened_values = []
        for data, points in data_with_points:
            round_vals = []
            for cf, pts in zip(data.coeffs, points):
                mat_vals = []
                for z in pts:
                    ys64 = join_host(np.asarray(next(ys_all)))  # (w, 2)
                    ys = [tuple(int(c) for c in row) for row in ys64]
                    for y in ys:
                        challenger.observe_ext(y)
                    mat_vals.append(ys)
                round_vals.append(mat_vals)
            opened_values.append(round_vals)

        alpha = challenger.sample_ext(2)

        # reduced openings per height bucket
        xs_cache = {}

        def xs_pairs(log_h):
            if log_h not in xs_cache:
                xs_cache[log_h] = powers_pair_device(
                    Goldilocks.two_adic_generator_h(log_h),
                    1 << log_h, scale=GLF.GENERATOR,
                )
                xs_cache[log_h] = (
                    bitrev_permute_axis0(xs_cache[log_h][0], log_h),
                    bitrev_permute_axis0(xs_cache[log_h][1], log_h),
                )
            return xs_cache[log_h]

        inv_denoms = {}
        reduced = {}
        num_reduced = {}
        for (data, points), round_vals in zip(
            data_with_points, opened_values
        ):
            for mat, pts, mat_vals in zip(
                data.matrices, points, round_vals
            ):
                h = mat.shape[0]
                log_h = log2_strict(h)
                w = mat.shape[1] // 2
                ap_host = np.empty((w, 2), dtype=np.uint64)
                cur = (1, 0)
                for j in range(w):
                    ap_host[j] = cur
                    cur = GLE.mul_h(cur, alpha)
                ap_dev = jnp.asarray(split_host(ap_host))  # (w, 4)
                ml, mh = depair(mat)
                mred_x = _gl_mred_kernel(ml, mh, ap_dev)
                for z, ys in zip(pts, mat_vals):
                    key = (z, log_h)
                    if key not in inv_denoms:
                        xl, xh = xs_pairs(log_h)
                        invd = _gl_inv_denom_kernel(
                            jnp.asarray(GLE.to_monty_np(z)), xl, xh
                        )
                        inv_denoms[key] = jnp.stack(
                            [invd[0][0], invd[0][1],
                             invd[1][0], invd[1][1]], axis=-1
                        )
                    acc = reduced.setdefault(
                        log_h, jnp.zeros((h, 4), jnp.uint32)
                    )
                    nr = num_reduced.get(log_h, 0)
                    # Mred(z) host-exact
                    mred_z = (0, 0)
                    for j, y in enumerate(ys):
                        term = GLE.mul_h(
                            tuple(int(v) for v in ap_host[j]), y
                        )
                        mred_z = GLE.add_h(mred_z, term)
                    alpha_off = GLE.exp_h(alpha, nr)
                    reduced[log_h] = _gl_accum_kernel(
                        acc,
                        jnp.asarray(GLE.to_monty_np(mred_z)),
                        mred_x[0][0], mred_x[0][1],
                        mred_x[1][0], mred_x[1][1],
                        inv_denoms[key],
                        jnp.asarray(GLE.to_monty_np(alpha_off)),
                    )
                    num_reduced[log_h] = nr + w

        fri_input = [
            reduced[lh] for lh in sorted(reduced.keys(), reverse=True)
        ]

        def open_input_fn(indices, batcher):
            futs = []
            for data, _ in data_with_points:
                log_batch_max = log2_strict(
                    max(m.shape[0] for m in data.matrices)
                )
                bits_reduced = log_global_max_height - log_batch_max
                futs.append(batcher.add(
                    self.mmcs, data,
                    [i >> bits_reduced for i in indices],
                ))

            def finish():
                return [
                    BatchMultiOpening(
                        opened_values=f.value[0],
                        opening_proof=f.value[1],
                    )
                    for f in futs
                ]

            return finish

        fri_proof = prove_fri(
            GLE, self.fri, self.fri_mmcs, fri_input, challenger,
            log_global_max_height, open_input_fn, spans=spans,
            folding=GLFriFolding(),
        )
        return opened_values, fri_proof

    # ------------------------------------------------------------------
    def verify(self, commitments_with_opening_points, proof, challenger):
        cwop = commitments_with_opening_points
        for _, mats in cwop:
            for _, points_and_values in mats:
                for _, ys in points_and_values:
                    for y in ys:
                        challenger.observe_ext(y)
        # alpha is sampled here (pre-verify_fri) so the GL-exact reduced
        # opening reconstruction can close over it; the transcript
        # position is identical to letting verify_fri sample it.
        alpha = challenger.sample_ext(2)
        log_gmh = max(
            dom.log_n + self.fri.log_blowup
            for (_, mats) in cwop
            for (dom, _) in mats
        )
        verify_fri(
            GLE, self.fri, proof, challenger, cwop,
            self.mmcs, self.fri_mmcs, alpha=alpha,
            open_inputs_fn=lambda indices: _gl_open_inputs(
                self.fri, log_gmh, indices, proof.input_openings,
                alpha, self.mmcs, cwop,
            ),
        )


def _gl_open_inputs(params, log_global_max_height, indices,
                    input_openings, alpha, input_mmcs, cwop):
    """GL-exact mirror of fri/verifier.py _open_inputs (the generic path
    reduces with u64-wrapping numpy products — sound for 31-bit fields,
    not for 64-bit Goldilocks; here products use the exact limb kernels).
    """
    E, G = GLE, Goldilocks
    Q = len(indices)
    if len(input_openings) != len(cwop):
        raise FriError("InputProofBatchCountMismatch")

    for batch, (opening, (commit, mats)) in enumerate(
        zip(input_openings, cwop)
    ):
        if len(opening.opened_values) != Q:
            raise FriError(f"InputOpeningsQueryCountMismatch batch {batch}")
        for q in range(Q):
            if len(opening.opened_values[q]) != len(mats):
                raise FriError(
                    f"BatchOpenedValuesCountMismatch batch {batch}"
                )
        heights = [dom.size << params.log_blowup for (dom, _) in mats]
        dims = []
        for m, (dom, points_and_values) in enumerate(mats):
            if not points_and_values:
                raise FriError(f"MatrixWithoutOpeningPoints {batch},{m}")
            dims.append((heights[m], len(points_and_values[0][1])))
        bits_reduced = log_global_max_height - max(heights).bit_length() + 1
        ok = input_mmcs.verify_multi_batch(
            commit, dims,
            [index >> bits_reduced for index in indices],
            opening.opened_values, opening.opening_proof,
        )
        if not ok:
            raise FriError(f"InputError batch {batch}")

    max_k = sum(
        len(pv) * len(pv[0][1])
        for (_, mats) in cwop
        for (_, pv) in mats
    )
    alpha_pows = [E.one_h()]
    for _ in range(max(max_k, 1) - 1):
        alpha_pows.append(E.mul_h(alpha_pows[-1], alpha))

    accs = [dict() for _ in range(Q)]
    offsets = {}
    for batch, (opening, (commit, mats)) in enumerate(zip(input_openings, cwop)):
        for m, (dom, points_and_values) in enumerate(mats):
            log_height = dom.log_n + params.log_blowup
            bits_reduced = log_global_max_height - log_height
            w = len(points_and_values[0][1])
            rows = np.array(
                [opening.opened_values[q][m] for q in range(Q)],
                dtype=np.uint64,
            )
            if rows.shape[1] < w:
                raise FriError("PointEvaluationCountMismatch")
            rows = rows[:, :w]
            g = G.two_adic_generator_h(log_height)
            xs = [
                G.mul_h(
                    GLF.GENERATOR,
                    G.exp_h(g, reverse_bits_len(
                        index >> bits_reduced, log_height)),
                )
                for index in indices
            ]
            k0 = offsets.setdefault(log_height, 0)
            ap0 = np.array(
                [alpha_pows[k0 + j][0] for j in range(w)], dtype=np.uint64
            )
            ap1 = np.array(
                [alpha_pows[k0 + j][1] for j in range(w)], dtype=np.uint64
            )
            mred0 = [
                (int(a), int(b))
                for a, b in zip(_gl_dot_np(rows, ap0), _gl_dot_np(rows, ap1))
            ]
            for p_i, (z, ps_at_z) in enumerate(points_and_values):
                if len(ps_at_z) != w:
                    raise FriError("PointEvaluationCountMismatch")
                scale = E.exp_h(alpha, p_i * w)
                c_z = E.zero_h()
                for j, pz in enumerate(ps_at_z):
                    c_z = E.add_h(c_z, E.mul_h(alpha_pows[k0 + j], pz))
                c_z = E.mul_h(scale, c_z)
                for q, index in enumerate(indices):
                    denom = E.sub_h(z, E.from_base_h(xs[q]))
                    if denom == E.zero_h():
                        raise FriError("OpeningPointMatchesQueryPoint")
                    mred = E.mul_h(scale, mred0[q])
                    quot = E.mul_h(E.sub_h(c_z, mred), E.inv_h(denom))
                    accs[q][log_height] = E.add_h(
                        accs[q].get(log_height, E.zero_h()), quot
                    )
            offsets[log_height] = k0 + len(points_and_values) * w

    out = []
    for q in range(Q):
        acc = accs[q]
        if (
            params.log_blowup in acc
            and acc[params.log_blowup] != E.zero_h()
        ):
            raise FriError("FinalPolyMismatch (height-1 quotient nonzero)")
        out.append(
            sorted(((lh, v) for lh, v in acc.items()), key=lambda t: -t[0])
        )
    return out
