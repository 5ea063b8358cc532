"""TwoAdicFriPcs: the univariate PCS over FRI (fri/src/two_adic_pcs.rs:50).

commit (:300): per matrix, coset-LDE onto gK (shift = GENERATOR/domain.shift)
in bit-reversed row order, then one multi-matrix Merkle commitment.

open (:412): for every (matrix, point z) compute the column evaluations ys
by barycentric interpolation over the committed bit-reversed LDE
(reusing the 1/(z-x) table), observe them, sample alpha, accumulate

    reduced[log_h][x] += alpha_offset · inv_denom[x] · (Mred(z) - Mred(x)),
    Mred(x) = sum_j alpha^j · M[x, j]

per height bucket (:601-655), then run FRI on the buckets (tallest first).

The two hot kernels — Mred (base-matrix × alpha-powers) and the barycentric
ys contraction — are batched VPU reductions today; the planned MXU path
decomposes uint32 lanes into 8-bit limbs and uses int8 matmuls with s32
accumulation (see SURVEY.md §7 hard part 1). TODO(round 2).

verify (:683): observe all claimed evals in prover order, then verify_fri.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..challenger.duplex import DuplexChallenger
from ..commit.domain import TwoAdicCoset
from ..fields.extension import BinomialExtension
from ..merkle.extension_mmcs import ExtensionMmcs
from ..merkle.mmcs import MerkleTreeMmcs
from ..ops.ntt import coset_lde_batch, powers_device
from ..utils.bits import bitrev_permute_axis0, log2_strict
from .config import FriParameters
from .proof import BatchMultiOpening
from .prover import prove_fri
from .verifier import verify_fri


# --- jitted hot kernels of open() (two_adic_pcs.rs:412-668). Fusing them
# into single programs keeps the Monty-limb intermediates of (h, w)-sized
# products in registers instead of materializing ~10 HBM-sized temporaries.
@partial(jax.jit, static_argnames=("E",))
def _inv_denom_kernel(E, zc, xs):
    """1/(z - x) for all rows x of the bit-reversed coset."""
    h = xs.shape[0]
    diff = E.sub(jnp.broadcast_to(zc, (h, E.D)), E.from_base(xs))
    return E.inv(diff)


@partial(jax.jit, static_argnames=("E",))
def _ys_kernel(E, mat, xs, inv_denom, factor_m):
    """Barycentric column evals: factor · Σ_i x_i·inv_denom_i · M[i, :]."""
    F = E.base
    wx = E.base_mul(xs, inv_denom)  # (h, D)
    comps = [
        F.sum(F.mul(wx[:, d : d + 1], mat), axis=0) for d in range(E.D)
    ]
    return E.mul(jnp.stack(comps, axis=-1), factor_m)  # (w, D)


# Chunk height for the MXU ys path: f32 accumulation of u8·u4 products
# is exact while chunk·255·15 < 2^24.
_YS_CHUNK = 1 << 12


@partial(jax.jit, static_argnames=("E", "log_n"))
def _ext_powers_device(E, z_m, log_n: int):
    """(2^log_n, D) monty table [1, z, z², ...] built by doubling concat
    on device (shipping a host table through the tunnel costs far more
    than the log n on-chip ext multiplies)."""
    one = jnp.asarray(E.to_monty_np(E.one_h()), jnp.uint32)
    if log_n == 0:
        return one[None, :]
    p = jnp.stack([one, z_m], axis=0)
    for _ in range(1, log_n):
        # p holds [z^0 .. z^(L-1)]; append p · z^L  (z^L = p[-1]·z)
        p = jnp.concatenate([p, E.mul(p, E.mul(p[-1:], z_m[None, :]))],
                            axis=0)
    return p


@partial(jax.jit, static_argnames=("E",))
def _dot_cols_mxu(E, mat, wx):
    """MXU column contraction Σ_i wx[i,d]·M[i,j] (monty in, monty out):
    mat splits into four u8 planes, wx into eight u4 planes; bf16
    matmuls accumulate exactly in f32 within 4096-row chunks (partials
    < 2^24), chunks combine with mod-P adds, and the 32 limb partials
    recombine with one Monty multiply by the raw constant 2^{8k+4l}
    (R²·Σ / R = R·Σ — the Monty form of the true sum)."""
    F = E.base
    h, w = mat.shape
    D = E.D
    w4 = jnp.stack(
        [(wx >> (4 * l)) & 0xF for l in range(8)], axis=-1
    ).astype(jnp.bfloat16).reshape(h, D * 8)

    chunk = min(h, _YS_CHUNK)
    n_chunks = h // chunk

    def body(args):  # (chunk, w) u32, (chunk, D·8) bf16
        mchunk, wchunk = args
        m8 = jnp.stack(
            [(mchunk >> (8 * k)) & 0xFF for k in range(4)], axis=1
        ).astype(jnp.bfloat16).reshape(chunk, 4 * w)
        part = jnp.dot(
            wchunk.T, m8, preferred_element_type=jnp.float32
        )  # (D·8, 4·w): one MXU matmul per chunk
        return part.astype(jnp.uint32)

    if n_chunks == 1:
        acc = body((mat, w4))
    else:
        parts = jax.lax.map(
            body,
            (mat.reshape(n_chunks, chunk, w),
             w4.reshape(n_chunks, chunk, D * 8)),
        )
        acc = parts[0]
        for c in range(1, n_chunks):
            acc = F.add(acc, parts[c])
    acc = acc.reshape(D, 8, 4, w)
    out = None
    for k in range(4):
        for l in range(8):
            c = jnp.uint32((1 << (8 * k + 4 * l)) % F.P)
            term = F.mul(acc[:, l, k, :], c)
            out = term if out is None else F.add(out, term)
    return out.T  # (w, D)


@partial(jax.jit, static_argnames=("E",))
def _dot_cols(E, mat, wx):
    """VPU fallback for _dot_cols_mxu (short matrices)."""
    F = E.base
    comps = [
        F.sum(F.mul(wx[:, d : d + 1], mat), axis=0) for d in range(E.D)
    ]
    return jnp.stack(comps, axis=-1)  # (w, D)


def _eval_coeffs(E, coeffs, zpow):
    """p(z) = Σ_i a_i·(z/g)^i from the PCS-retained scaled coefficients
    (uniform z' = z/g for every committed matrix: rows live on gK, so
    the opened interpolant is r(x) = q(x·shift'/g) and
    r(z) = Σ a_i (z/g)^i regardless of the input domain's shift)."""
    h = coeffs.shape[0]
    if h >= (1 << 13):
        return _dot_cols_mxu(E, coeffs, zpow[:h])
    return _dot_cols(E, coeffs, zpow[:h])


@partial(jax.jit, static_argnames=("E",))
def _ys_kernel_mxu(E, mat, xs, inv_denom, factor_m):
    """MXU path for the barycentric column evals (see _dot_cols_mxu)."""
    wx = E.base_mul(xs, inv_denom)  # (h, D) monty
    return E.mul(_dot_cols_mxu(E, mat, wx), factor_m)


def _ys(E, mat, xs, inv_denom, factor_m):
    """Dispatch: MXU limb path for tall matrices, else VPU."""
    if mat.shape[0] >= (1 << 13):
        return _ys_kernel_mxu(E, mat, xs, inv_denom, factor_m)
    return _ys_kernel(E, mat, xs, inv_denom, factor_m)


@partial(jax.jit, static_argnames=("E",))
def _mred_kernel(E, mat, ap_dev):
    """Mred(x) = Σ_j alpha^j·M[x, j] — the rowwise_packed_dot_product
    analog (two_adic_pcs.rs:624-627). VPU fallback path."""
    F = E.base
    return jnp.stack(
        [F.sum(F.mul(mat, ap_dev[None, :, d]), axis=1) for d in range(E.D)],
        axis=-1,
    )


# Exactness bound for the MXU limb path: partial sums are Σ_w u8·u4
# products accumulated in f32 — exact while w·255·15 < 2^24.
_MXU_MAX_WIDTH = (1 << 24) // (255 * 15)


@partial(jax.jit, static_argnames=("E",))
def _mred_kernel_mxu(E, mat, ap_dev):
    """The MXU path for Mred (SURVEY §7 hard part 1): decompose the
    Monty-form u32 matrix into four u8 limb planes and the alpha powers
    into eight u4 planes, contract with bf16 matmuls (inputs ≤ 255/15
    are exact in bf16; TPU matmuls accumulate in f32, and every partial
    sum stays < 2^24 so the arithmetic is EXACT), then recombine the 32
    partials with one Monty multiply each:

        Σ_j m_j·a_jd = Σ_{k,l} 2^{8k+4l}·(Σ_j M_k[j]·A_l[j,d])

    The integer dot of Monty residues is R²·Σxy; multiplying each
    partial by the RAW constant 2^{8k+4l} under Monty mul (which divides
    by R) leaves R·Σxy — the Monty form of the true Mred. Rows are
    processed in chunks via lax.map so the f32 limb planes never
    materialize at full height."""
    F = E.base
    h, w = mat.shape
    D = E.D
    a4 = jnp.stack(
        [(ap_dev >> (4 * l)) & 0xF for l in range(8)], axis=-1
    ).astype(jnp.bfloat16)  # (w, D, 8)

    chunk = min(h, 1 << 13)
    n_chunks = h // chunk

    a4_mat = a4.reshape(w, D * 8)  # (w, 32·?) static

    def body(mchunk):  # (chunk, w) u32
        hc = mchunk.shape[0]
        m8 = jnp.stack(
            [(mchunk >> (8 * k)) & 0xFF for k in range(4)], axis=0
        ).astype(jnp.bfloat16)  # (4, chunk, w)
        part = jnp.dot(
            m8.reshape(4 * hc, w), a4_mat,
            preferred_element_type=jnp.float32,
        )  # (4·chunk, D·8): ONE clean MXU matmul per chunk
        part_u = part.astype(jnp.uint32).reshape(4, hc, D, 8)
        acc = None
        for k in range(4):
            for l in range(8):
                c = jnp.uint32((1 << (8 * k + 4 * l)) % F.P)
                term = F.mul(part_u[k, :, :, l], c)
                acc = term if acc is None else F.add(acc, term)
        return acc  # (chunk, D)

    if n_chunks == 1:
        return body(mat)
    out = jax.lax.map(body, mat.reshape(n_chunks, chunk, w))
    return out.reshape(h, D)


def _mred(E, mat, ap_dev):
    """Dispatch: MXU limb path when the width bound allows, else VPU."""
    if mat.shape[1] <= _MXU_MAX_WIDTH and mat.shape[0] >= (1 << 10):
        return _mred_kernel_mxu(E, mat, ap_dev)
    return _mred_kernel(E, mat, ap_dev)


@partial(jax.jit, static_argnames=("E",))
def _accum_kernel(E, acc, mred_z_m, mat_compressed, inv_denom, alpha_off_m):
    """acc += alpha_off · (Mred(z) - Mred(x)) / (z - x)."""
    h = mat_compressed.shape[0]
    diff = E.sub(jnp.broadcast_to(mred_z_m, (h, E.D)), mat_compressed)
    return E.add(acc, E.mul(E.mul(diff, inv_denom), alpha_off_m))


def _poly_mats(data):
    """Committed matrices with hiding salts stripped (salt columns are
    leaf blinding, not polynomial data — hiding_mmcs.rs semantics)."""
    salt = getattr(data, "salt_elems", 0)
    if not salt:
        return data.matrices
    return [m[:, : m.shape[1] - salt] for m in data.matrices]


@dataclass(frozen=True)
class TwoAdicFriPcs:
    F: object  # Monty31
    E: BinomialExtension
    fri: FriParameters
    mmcs: MerkleTreeMmcs  # input (base) commitments
    fri_mmcs: ExtensionMmcs  # commit-phase (extension) commitments

    # get_evaluations_on_domain accepts order="bitrev" (a free prefix
    # slice of the committed bitrev LDE — see stark/prover.py q_order)
    supports_bitrev_evals = True

    # ------------------------------------------------------------------
    def natural_domain_for_degree(self, degree: int) -> TwoAdicCoset:
        return TwoAdicCoset(self.F, 1, log2_strict(degree))

    def commit(self, evaluations):
        """evaluations: [(TwoAdicCoset, device (n, w) natural-order mat)].

        Returns MerkleProverData whose matrices are the bit-reversed LDEs
        over gK (two_adic_pcs.rs:300-320); `data.domains` records inputs.
        """
        ldes = []
        domains = []
        coeffs = []
        for domain, evals in evaluations:
            assert evals.shape[0] == domain.size
            shift = self.F.mul_h(
                self.F.GENERATOR, self.F.inv_h(domain.shift)
            )
            lde, cf = coset_lde_batch(
                self.F, evals, self.fri.log_blowup, shift,
                with_coeffs=True,
            )
            ldes.append(lde)
            coeffs.append(cf)
            domains.append(domain)
        data = self.mmcs.commit(ldes)
        data.domains = domains
        # scaled coefficients a_i = c_i·shift^i per matrix: open() turns
        # each (mat, ζ) into one MXU dot Σ a_i·(ζ/g)^i instead of a
        # barycentric pass over the (blowup× taller) LDE
        data.coeffs = coeffs
        return data

    def get_evaluations_on_domain(self, data, mat_index: int,
                                  domain: TwoAdicCoset,
                                  order: str = "natural"):
        """Evaluations of committed matrix over `domain`.

        `domain` must be a sub-coset of the committed LDE coset with the
        same shift (the uni-stark quotient domain). In bit-reversed order
        the restriction is a prefix (SURVEY.md §7 design stance), so the
        'bitrev' order is a free slice, and 'natural' adds one row
        gather."""
        lde = data.matrices[mat_index]
        log_lde = log2_strict(lde.shape[0])
        committed = TwoAdicCoset(self.F, self.F.GENERATOR, log_lde)
        assert domain.shift == committed.shift, "domain must share shift gK"
        prefix = lde[: domain.size]
        if order == "bitrev":
            return prefix
        return bitrev_permute_axis0(prefix, domain.log_n)

    # ------------------------------------------------------------------
    def open(self, data_with_points, challenger: DuplexChallenger,
             spans=None):
        """data_with_points: [(MerkleProverData, [[z per matrix]])].

        Returns (opened_values, FriProof); opened_values[round][mat][point]
        is the list of per-column evals (ext tuples).
        """
        import time as _time

        _t = {"last": _time.perf_counter()}

        def _mark(name):
            if spans is not None:
                now = _time.perf_counter()
                spans[name] = spans.get(name, 0.0) + now - _t["last"]
                _t["last"] = now

        F, E = self.F, self.E
        lb = self.fri.log_blowup

        all_mats = [
            (rnd, i, mat)
            for rnd, (data, _) in enumerate(data_with_points)
            for i, mat in enumerate(_poly_mats(data))
        ]
        log_global_max_height = max(
            log2_strict(m.shape[0]) for _, _, m in all_mats
        )

        # bit-reversed coset points for the global max height
        xs_br = bitrev_permute_axis0(
            powers_device(
                F,
                F.two_adic_generator_h(log_global_max_height),
                1 << log_global_max_height,
                scale_std=F.GENERATOR,
            ),
            log_global_max_height,
        )

        # max height each opening point is used at (drives the 1/(z-x)
        # tables the reduced-opening accumulation needs)
        max_h_for_point = {}
        for data, points in data_with_points:
            for mat, pts in zip(_poly_mats(data), points):
                for z in pts:
                    h = mat.shape[0]
                    max_h_for_point[z] = max(max_h_for_point.get(z, 0), h)

        # column evaluations ys: launch every kernel first (async), fetch
        # ALL results in one round-trip, then observe in transcript order
        # (each separate pull costs ~30 ms of tunnel latency).
        from ..utils.transfer import pull_all

        use_coeffs = all(
            getattr(data, "coeffs", None) is not None
            for data, _ in data_with_points
        )
        ys_devs = []
        if use_coeffs:
            # one MXU dot per (matrix, point): ys = Σ_i a_i·(z/g)^i over
            # the commit-retained scaled coefficients — no barycentric
            # pass over the LDE, no 1/(z-x) on this critical path
            g_inv = F.inv_h(F.GENERATOR)
            zpows = {}
            for z, h in max_h_for_point.items():
                zg = E.base_mul_h(g_inv, z)
                zpows[z] = _ext_powers_device(
                    E, jnp.asarray(E.to_monty_np(zg)),
                    log2_strict(h) - lb,
                )
            for data, points in data_with_points:
                for cf, pts in zip(data.coeffs, points):
                    for z in pts:
                        ys_devs.append(_eval_coeffs(E, cf, zpows[z]))
        else:
            inv_denoms = {
                z: _inv_denom_kernel(
                    E, jnp.asarray(E.to_monty_np(z)), xs_br[:h]
                )
                for z, h in max_h_for_point.items()
            }
            for data, points in data_with_points:
                for mat, pts in zip(_poly_mats(data), points):
                    h = mat.shape[0]
                    n_std = h  # coset size
                    for z in pts:
                        # scale by (z^n - s^n)/(n·s^n), s = GENERATOR
                        s_pow_n = F.exp_h(F.GENERATOR, n_std)
                        zn = E.exp_h(z, n_std)
                        factor = E.base_mul_h(
                            F.inv_h(F.mul_h(n_std, s_pow_n)),
                            E.sub_h(zn, E.from_base_h(s_pow_n)),
                        )
                        ys_devs.append(_ys(
                            E, mat, xs_br[:h], inv_denoms[z][:h],
                            jnp.asarray(E.to_monty_np(factor)),
                        ))
        _mark("open: ys dispatch")
        ys_all = iter(pull_all(ys_devs))
        _mark("open: ys pull")

        if use_coeffs:
            # the reduced-opening accumulation below still needs the
            # 1/(z-x) tables; launching them AFTER the ys pull keeps the
            # (in-order) device stream from delaying it — they execute
            # while the host observes ys into the transcript
            inv_denoms = {
                z: _inv_denom_kernel(
                    E, jnp.asarray(E.to_monty_np(z)), xs_br[:h]
                )
                for z, h in max_h_for_point.items()
            }

        opened_values = []
        for data, points in data_with_points:
            round_vals = []
            for mat, pts in zip(_poly_mats(data), points):
                mat_vals = []
                for z in pts:
                    ys_np = F.from_monty_np(next(ys_all))
                    ys = [tuple(r) for r in ys_np.tolist()]
                    if hasattr(challenger, "observe_base_array"):
                        challenger.observe_base_array(ys_np)
                    else:
                        for y in ys:
                            challenger.observe_ext(y)
                    mat_vals.append(ys)
                round_vals.append(mat_vals)
            opened_values.append(round_vals)

        _mark("open: barycentric ys + observe")
        alpha = challenger.sample_ext(E.D)

        # reduced openings per height bucket
        reduced = {}  # log_h -> (h, D) device ext accumulator
        num_reduced = {}  # log_h -> count of (col, point) pairs folded in
        for (data, points), round_vals in zip(data_with_points, opened_values):
            for mat, pts, mat_vals in zip(_poly_mats(data), points, round_vals):
                h = mat.shape[0]
                log_h = log2_strict(h)
                w = mat.shape[1]
                alpha_pows = E.powers_np(alpha, w)  # (w, D) host-exact
                mat_compressed = _mred(
                    E, mat, jnp.asarray(alpha_pows)
                )  # (h, D)
                for z, ys in zip(pts, mat_vals):
                    acc = reduced.setdefault(
                        log_h, jnp.zeros((h, E.D), jnp.uint32)
                    )
                    nr = num_reduced.get(log_h, 0)
                    # Mred(z) on host, vectorized: Σ_j alpha^j · ys_j
                    ys_m = F.to_monty_np(
                        np.asarray(ys, dtype=np.uint64).astype(np.uint32)
                    )
                    prods = E.mul_np(alpha_pows[: len(ys)], ys_m)
                    mred_z = tuple(
                        int(v)
                        for v in F.from_monty_np(
                            (
                                prods.astype(np.uint64).sum(axis=0)
                                % np.uint64(F.P)
                            ).astype(np.uint32)
                        )
                    )
                    alpha_off = E.exp_h(alpha, nr)
                    reduced[log_h] = _accum_kernel(
                        E, acc,
                        jnp.asarray(E.to_monty_np(mred_z)),
                        mat_compressed,
                        inv_denoms[z][:h],
                        jnp.asarray(E.to_monty_np(alpha_off)),
                    )
                    num_reduced[log_h] = nr + w
        _mark("open: acc dispatch")
        fri_input = [
            reduced[lh] for lh in sorted(reduced.keys(), reverse=True)
        ]
        _mark("open: reduced accumulation")

        def open_input_fn(indices, batcher):
            futs = []
            for data, _ in data_with_points:
                log_batch_max = log2_strict(
                    max(m.shape[0] for m in data.matrices)
                )
                bits_reduced = log_global_max_height - log_batch_max
                futs.append(batcher.add(
                    self.mmcs, data, [i >> bits_reduced for i in indices]
                ))

            def finish():
                return [
                    BatchMultiOpening(
                        opened_values=f.value[0], opening_proof=f.value[1]
                    )
                    for f in futs
                ]

            return finish

        fri_proof = prove_fri(
            E,
            self.fri,
            self.fri_mmcs,
            fri_input,
            challenger,
            log_global_max_height,
            open_input_fn,
            spans=spans,
        )
        _mark("open: fri")
        return opened_values, fri_proof

    # ------------------------------------------------------------------
    def verify(self, commitments_with_opening_points, proof, challenger):
        """commitments_with_opening_points:
        [(root, [(TwoAdicCoset, [(z, ys)])])]  (two_adic_pcs.rs:683)."""
        for _, mats in commitments_with_opening_points:
            for _, points_and_values in mats:
                for _, ys in points_and_values:
                    for y in ys:
                        challenger.observe_ext(y)
        verify_fri(
            self.E,
            self.fri,
            proof,
            challenger,
            commitments_with_opening_points,
            self.mmcs,
            self.fri_mmcs,
        )
