"""CirclePcs — the univariate PCS for Mersenne-31 over the circle group.

Behavioral model of `circle/src/pcs.rs:39` (+ deep_quotient.rs, folding.rs):

  commit: natural-order evals -> cfft-order -> interpolate -> evaluate on
    standard(log_n + log_blowup) -> multi-matrix MMCS over cfft-order rows.
  open: per (matrix, zeta): Lagrange evals over the height-2^log_sub prefix
    (pcs.rs:255-268); observe; sample alpha; DEEP-quotient reduce per
    height bucket (accumulate_deep_quotient); extract lambda (the CFFT
    dimension-gap component, deep_quotient.rs:228); commit all (h/2, 2)
    first-layer matrices in one tree; sample bivariate beta; fold_y; run
    FRI with circle folding (fold_x, arity 2, 1 extra query index bit).
  verify: exact host replay per query (deep_quotient_reduce_row, lambda
    correction, y-fold, x-fold chain).

Device kernels handle everything O(LDE size); the query phase is exact
host arithmetic over QM31.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.mersenne31 import Mersenne31 as F
from ..fields.qm31 import QM31
from ..fri.config import FriParameters
from ..fri.proof import BatchMultiOpening, FriProof
from ..fri.prover import prove_fri
from ..fri.verifier import FriError, verify_fri
from ..ops.circle import (
    CircleDomain,
    cfft_evaluate,
    cfft_interpolate,
    cfft_perm_indices,
    cfft_permute_index,
    pt_add,
    pt_mul,
    pt_neg,
    pt_v_n,
)
from ..utils.bits import bitrev_indices, log2_strict, reverse_bits_len

_P = F.P
_INV2 = pow(2, _P - 2, _P)


# ---------------------------------------------------------------------------
# extension-field circle points (host; coords are QM31 tuples)
# ---------------------------------------------------------------------------
def ept_add(E, a, b):
    return (
        E.sub_h(E.mul_h(a[0], b[0]), E.mul_h(a[1], b[1])),
        E.add_h(E.mul_h(a[0], b[1]), E.mul_h(a[1], b[0])),
    )


def ept_from_projective_line(E, t):
    """Point::from_projective_line (point.rs:40)."""
    t2 = E.mul_h(t, t)
    inv_denom = E.inv_h(E.add_h(E.one_h(), t2))
    x = E.mul_h(E.sub_h(E.one_h(), t2), inv_denom)
    y = E.mul_h(E.add_h(t, t), inv_denom)
    return (x, y)


def ept_v_n(E, x, log_n: int):
    for _ in range(log_n - 1):
        x = E.sub_h(E.add_h(E.mul_h(x, x), E.mul_h(x, x)), E.one_h())
    return x


# ---------------------------------------------------------------------------
# cached host domain data per log_height
# ---------------------------------------------------------------------------
_DOMAIN_CACHE: dict = {}


def _domain_data(log_h: int):
    """cfft-ordered point arrays of standard(log_h)."""
    d = _DOMAIN_CACHE.get(log_h)
    if d is None:
        dom = CircleDomain.standard(log_h)
        pts = dom.points_natural()
        perm = cfft_perm_indices(log_h)
        px = np.array([p[0] for p in pts], dtype=np.uint32)[perm]
        py = np.array([p[1] for p in pts], dtype=np.uint32)[perm]
        d = dict(dom=dom, px=px, py=py)
        _DOMAIN_CACHE[log_h] = d
    return d


_SP_CACHE: dict = {}


def _s_p_values(log_h: int, log_sub: int) -> np.ndarray:
    """s_p_at_p(log_sub) for the first 2^log_sub cfft points of
    standard(log_h): -(v_n_prod(log_sub)·2^(2·log_sub-1))·y (point.rs:110).

    The Lagrange normalization is taken at the SUB-domain size — the
    reference passes log_sub to compute_lagrange_den_batched (pcs.rs:295).
    """
    key = (log_h, log_sub)
    s = _SP_CACHE.get(key)
    if s is None:
        dd = _domain_data(log_h)
        n = 1 << log_sub
        px = dd["px"][:n]
        py = dd["py"][:n]
        x = px.astype(np.uint64)
        if log_sub >= 2:
            out = x.copy()
            for _ in range(log_sub - 2):
                x = (2 * x * x + _P - 1) % _P
                out = (out * x) % _P
        else:
            out = np.ones_like(x)
        scale = pow(2, 2 * log_sub - 1, _P)
        s_p = (_P - (out * scale) % _P) % _P
        s_p = (s_p * py.astype(np.uint64)) % _P
        s = s_p.astype(np.uint32)
        _SP_CACHE[key] = s
    return s


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("E",))
def _lagrange_den_kernel(E, px, py, s_p, zx, zy):
    """(ṽ_P(zeta)·s_p)^{-1} per cfft-ordered point (point.rs:128).

    diff = zeta - p: diff.x = zx·px + zy·py, diff.y = zy·px - zx·py.
    den_i = (diff.y · s_p)^{-1} · (diff.x + 1).
    """
    dx = E.add(E.base_mul(px, zx), E.base_mul(py, zy))
    dy = E.sub(E.base_mul(px, zy), E.base_mul(py, zx))
    numer = E.add(dx, E.from_base(jnp.full(px.shape, jnp.uint32(1))))
    denom = E.mul(dy, E.from_base(s_p))
    return E.mul(numer, E.inv(denom))


@partial(jax.jit, static_argnames=("E",))
def _ys_kernel_circle(E, mat, dens, num):
    """ys_j = (Σ_i den_i · M[i,j]) · v_H(zeta)  (cfft.rs:137-151)."""
    comps = [
        F.sum(F.mul(dens[:, d : d + 1], mat), axis=0) for d in range(E.D)
    ]
    return E.mul(jnp.stack(comps, axis=-1), num)


@partial(jax.jit, static_argnames=("E",))
def _alpha_reduce_kernel(E, mat, alpha_pows):
    """r_i = Σ_j alpha^j·M[i, j] (deep_quotient.rs rowwise_alpha_reduce)."""
    return jnp.stack(
        [
            F.sum(F.mul(mat, alpha_pows[None, :, d]), axis=1)
            for d in range(E.D)
        ],
        axis=-1,
    )


@partial(jax.jit, static_argnames=("E",))
def _vanishing_parts_kernel(E, px, py, zx, zy):
    """v_p(zeta) = (1 - diff.x, -diff.y), diff = p - zeta (point.rs:119:
    `-at + self`), plus inverse squared magnitude.

    diff.x = px·zx + py·zy (symmetric); diff.y = py·zx - px·zy."""
    dx = E.add(E.base_mul(px, zx), E.base_mul(py, zy))
    dy = E.sub(E.base_mul(py, zx), E.base_mul(px, zy))
    one = E.from_base(jnp.full(px.shape, jnp.uint32(1)))
    re = E.sub(one, dx)
    im = E.neg(dy)
    denom = E.add(E.mul(re, re), E.mul(im, im))
    return re, im, E.inv(denom)


@partial(jax.jit, static_argnames=("E",))
def _accumulate_kernel(E, ro, alpha_off, alpha_pw, re, im, denom_inv,
                       reduced_rows, c):
    """ro += alpha_off·(re - α^W·im)·denom_inv·(r - c)."""
    vp = E.sub(re, E.mul(im, alpha_pw))
    term = E.mul(E.mul(vp, denom_inv), E.sub(reduced_rows, c))
    return E.add(ro, E.mul(term, alpha_off))


@partial(jax.jit, static_argnames=("E", "log_blowup"))
def _extract_lambda_kernel(E, ro, v_d, log_blowup):
    """deep_quotient.rs:228: lambda = <ro, v_d>/2^(log-1); ro -= λ·v_d."""
    log_h = log2_strict(ro.shape[0])
    comps = [F.sum(F.mul(ro[:, d], v_d), axis=0) for d in range(E.D)]
    lam = jnp.stack(comps, axis=-1)
    inv = F.const(pow(pow(2, log_h - 1, _P), _P - 2, _P))
    lam = F.mul(lam, inv)
    ro = E.sub(ro, E.base_mul(v_d, lam))
    return ro, lam


@partial(jax.jit, static_argnames=("E", "log_h"))
def _fold_kernel(E, mat2, beta, inv_tw, log_h):
    """((lo+hi) + β·(lo-hi)·t)/2 rowwise (folding.rs:54-85)."""
    lo, hi = mat2[:, 0], mat2[:, 1]
    s = E.add(lo, hi)
    d = E.mul(E.base_mul(inv_tw, E.sub(lo, hi)), beta)
    return F.mul(E.add(s, d), F.const(_INV2))


def _v_d_array(log_h: int, log_blowup: int) -> np.ndarray:
    """The vanishing-poly values v_d(i) over cfft-ordered indices
    (deep_quotient.rs:236-250 pattern)."""
    dom = CircleDomain.standard(log_h)
    pts = dom.points_natural()[: 1 << log_blowup]
    v_init = [pt_v_n(p[0], log_h - log_blowup) for p in pts]
    b = 1 << log_blowup
    out = np.empty(1 << log_h, dtype=np.uint32)
    for i in range(1 << log_h):
        m = cfft_permute_index(i, log_h) & (2 * b - 1)
        out[i] = v_init[m] if m < b else v_init[2 * b - 1 - m]
    return out


_Y_TWIDDLE_CACHE: dict = {}


def _y_twiddles_inv(log_h: int) -> np.ndarray:
    """Inverted bitrev'd y-coords of standard(log_h).coset0 (cfft.rs:532)."""
    t = _Y_TWIDDLE_CACHE.get(log_h)
    if t is None:
        dom = CircleDomain.standard(log_h)
        ys = [p[1] for p in dom.coset0_points()]
        br = bitrev_indices(log_h - 1)
        t = np.array(
            [pow(ys[int(i)], _P - 2, _P) for i in br], dtype=np.uint32
        )
        _Y_TWIDDLE_CACHE[log_h] = t
    return t


_X_TWIDDLE_CACHE: dict = {}


def _x_twiddles_inv(log_n_plus1: int) -> np.ndarray:
    """Inverted bitrev'd layer-0 x twiddles of standard(log_n_plus1)
    (cfft.rs:538, folding.rs fold_x)."""
    t = _X_TWIDDLE_CACHE.get(log_n_plus1)
    if t is None:
        dom = CircleDomain.standard(log_n_plus1)
        g = dom.subgroup_generator()
        p = dom.shift
        xs = []
        for _ in range(1 << (log_n_plus1 - 2)):
            xs.append(p[0])
            p = pt_add(p, g)
        br = bitrev_indices(log_n_plus1 - 2)
        t = np.array(
            [pow(xs[int(i)], _P - 2, _P) for i in br], dtype=np.uint32
        )
        _X_TWIDDLE_CACHE[log_n_plus1] = t
    return t


class CircleFriFolding:
    """FriFoldingStrategy for the circle group (folding.rs:28-52)."""

    extra_query_index_bits = 1
    observe_arity_schedule = False  # circle/src/prover.rs: fixed arity 2
    scale_roll_in = False  # circle/src/prover.rs:162: `*c += x`, unscaled

    def __init__(self, E):
        self.E = E

    def fold_matrix(self, folded, beta, log_arity):
        E = self.E
        assert log_arity == 1, "circle FRI supports arity 2 only"
        h = folded.shape[0]
        log_n = log2_strict(h)
        inv_tw = _x_twiddles_inv(log_n + 1)
        beta_m = E.to_monty_np(beta)
        m2 = folded.reshape(h // 2, 2, E.D)
        if isinstance(folded, np.ndarray):
            lo, hi = m2[:, 0], m2[:, 1]
            s = E.add_np(lo, hi)
            d = E.mul_np(E.base_mul_np(inv_tw, E.sub_np(lo, hi)), beta_m)
            half = np.uint32(_INV2)
            return F.mul_np(E.add_np(s, d), half)
        return _fold_kernel(
            E, m2, jnp.asarray(beta_m), jnp.asarray(inv_tw), log_n
        )

    def fold_row(self, Ex, index, log_folded, log_arity, beta, group):
        """Verifier-side x-fold (folding.rs fold_x_row)."""
        E = self.E
        assert log_arity == 1
        dom = CircleDomain.standard(log_folded + 2)
        k = reverse_bits_len(index, log_folded)
        t = pt_add(dom.shift, pt_mul(dom.subgroup_generator(), k))[0]
        t_inv = pow(t, _P - 2, _P)
        e0, e1 = group
        s = E.add_h(e0, e1)
        d = E.mul_h(E.base_mul_h(t_inv, E.sub_h(e0, e1)), beta)
        return E.base_mul_h(_INV2, E.add_h(s, d))


@dataclass
class CircleInputProof:
    input_openings: list  # [BatchMultiOpening] per input commitment
    first_layer_siblings: list  # [query][height-asc] ext tuples
    first_layer_proofs: list  # pruned: flat list of digests (shared)


@dataclass
class CirclePcsProof:
    first_layer_commitment: tuple
    lambdas: list  # ext tuples, ascending log_height
    fri_proof: FriProof


@dataclass(frozen=True)
class CirclePcs:
    fri: FriParameters
    mmcs: object  # input MMCS (base field)
    fri_mmcs: object  # ExtensionMmcs for first layer + commit phase
    ext: object = QM31  # challenge extension field (QM31 or M31 cubic)

    @property
    def F(self):
        return F

    @property
    def E(self):
        return self.ext

    def natural_domain_for_degree(self, degree: int) -> CircleDomain:
        return CircleDomain.standard(log2_strict(degree))

    def log_max_lde_height(self) -> int:
        return 30  # CIRCLE_TWO_ADICITY - 1 (pcs.rs:139)

    # ------------------------------------------------------------------
    def commit(self, evaluations):
        """evaluations: [(CircleDomain, (n, w) natural-order device mat)].

        LDE onto standard(log_n + blowup), committed in cfft order
        (pcs.rs:142-163)."""
        ldes, domains = [], []
        for domain, evals in evaluations:
            assert domain.log_n >= 2, "need >= 4 rows (one fold + fri)"
            perm = jnp.asarray(cfft_perm_indices(domain.log_n))
            vals_cfft = evals[perm]
            coeffs = cfft_interpolate(domain, vals_cfft)
            big = CircleDomain.standard(domain.log_n + self.fri.log_blowup)
            ldes.append(cfft_evaluate(big, coeffs))
            domains.append(domain)
        data = self.mmcs.commit(ldes)
        data.domains = domains
        return data

    def get_evaluations_on_domain(self, data, mat_index: int, domain):
        """Natural-order evaluations over `domain` (pcs.rs:191-220)."""
        mat = data.matrices[mat_index]
        log_lde = log2_strict(mat.shape[0])
        log_sub = log_lde - self.fri.log_blowup
        sub = CircleDomain(log_sub, CircleDomain.standard(log_lde).shift)
        coeffs = cfft_interpolate(sub, mat[: 1 << log_sub])
        out_cfft = cfft_evaluate(domain, coeffs)
        perm = jnp.asarray(cfft_perm_indices(domain.log_n))
        return out_cfft[perm]

    # ------------------------------------------------------------------
    def open(self, data_with_points, challenger, spans=None):
        """data_with_points: [(data, [[zeta_uni per matrix]])]; zeta_uni
        are projective-line ext tuples. Returns (opened_values, proof)."""
        E = self.ext
        # --- claimed evaluations via Lagrange over the sub prefix ---
        lagrange_dens: dict = {}  # (log_h, zeta) -> device (sub_h, D)
        opened_values = []
        for data, points in data_with_points:
            round_vals = []
            for mat, pts in zip(data.matrices, points):
                log_h = log2_strict(mat.shape[0])
                log_sub = log_h - self.fri.log_blowup
                sub_h = 1 << log_sub
                dd = _domain_data(log_h)
                sub_shift = CircleDomain.standard(log_h).shift
                mat_vals = []
                for zeta_uni in pts:
                    key = (log_h, zeta_uni)
                    den = lagrange_dens.get(key)
                    zeta = ept_from_projective_line(E, zeta_uni)
                    if den is None:
                        den = _lagrange_den_kernel(
                            E,
                            jnp.asarray(dd["px"][:sub_h]),
                            jnp.asarray(dd["py"][:sub_h]),
                            jnp.asarray(_s_p_values(log_h, log_sub)),
                            jnp.asarray(E.to_monty_np(zeta[0])),
                            jnp.asarray(E.to_monty_np(zeta[1])),
                        )
                        lagrange_dens[key] = den
                    # lagrange_num = v_n(zeta) - v_n(sub_shift), log_sub
                    num = E.sub_h(
                        ept_v_n(E, zeta[0], log_sub),
                        E.from_base_h(pt_v_n(sub_shift[0], log_sub)),
                    )
                    ys_dev = _ys_kernel_circle(
                        E, mat[:sub_h], den,
                        jnp.asarray(E.to_monty_np(num)),
                    )
                    ys = [
                        tuple(int(c) for c in row)
                        for row in np.asarray(ys_dev)
                    ]
                    for y in ys:
                        challenger.observe_ext(y)
                    mat_vals.append(ys)
                round_vals.append(mat_vals)
            opened_values.append(round_vals)

        alpha = challenger.sample_ext(E.D)

        # --- DEEP quotient accumulation per height (pcs.rs:330-440) ---
        reduced: dict = {}  # log_h -> (alpha_offset ext, device (h,4))
        vparts: dict = {}  # (log_h, zeta_uni) -> (re, im, denom_inv)
        for (data, points), round_vals in zip(
            data_with_points, opened_values
        ):
            for mat, pts, mat_vals in zip(
                data.matrices, points, round_vals
            ):
                log_h = log2_strict(mat.shape[0])
                h = 1 << log_h
                w = mat.shape[1]
                dd = _domain_data(log_h)
                off, ro = reduced.setdefault(
                    log_h, (E.one_h(), jnp.zeros((h, E.D), jnp.uint32))
                )
                alpha_pows = E.powers_np(alpha, w)
                reduced_rows = _alpha_reduce_kernel(
                    E, mat, jnp.asarray(alpha_pows)
                )
                alpha_pw = E.exp_h(alpha, w)
                for zeta_uni, ys in zip(pts, mat_vals):
                    zeta = ept_from_projective_line(E, zeta_uni)
                    key = (log_h, zeta_uni)
                    vp = vparts.get(key)
                    if vp is None:
                        vp = _vanishing_parts_kernel(
                            E,
                            jnp.asarray(dd["px"]),
                            jnp.asarray(dd["py"]),
                            jnp.asarray(E.to_monty_np(zeta[0])),
                            jnp.asarray(E.to_monty_np(zeta[1])),
                        )
                        vparts[key] = vp
                    c = E.zero_h()
                    ap = E.one_h()
                    for y in ys:
                        c = E.add_h(c, E.mul_h(ap, y))
                        ap = E.mul_h(ap, alpha)
                    off, ro = reduced[log_h]
                    ro = _accumulate_kernel(
                        E,
                        ro,
                        jnp.asarray(E.to_monty_np(off)),
                        jnp.asarray(E.to_monty_np(alpha_pw)),
                        vp[0], vp[1], vp[2],
                        reduced_rows,
                        jnp.asarray(E.to_monty_np(c)),
                    )
                    off = E.mul_h(off, E.mul_h(alpha_pw, alpha_pw))
                    reduced[log_h] = (off, ro)

        # --- lambda extraction + first layer (pcs.rs:443-480) ---
        lambdas, log_heights, fl_mats = [], [], []
        for log_h in sorted(reduced.keys()):
            _, ro = reduced[log_h]
            v_d = jnp.asarray(_v_d_array(log_h, self.fri.log_blowup))
            ro, lam = _extract_lambda_kernel(E, ro, v_d, self.fri.log_blowup)
            lambdas.append(tuple(int(x) for x in np.asarray(lam)))
            log_heights.append(log_h)
            fl_mats.append(ro.reshape(1 << (log_h - 1), 2, E.D))
        log_max = max(log_heights)

        fl_data = self.fri_mmcs.commit_ext_matrices(fl_mats)
        challenger.observe_digest(fl_data.commitment)
        bivariate_beta = challenger.sample_ext(E.D)

        # fold_y each first layer, tallest first for FRI
        fri_input = []
        for log_h, m in sorted(
            zip(log_heights, fl_mats), key=lambda t: -t[0]
        ):
            inv_tw = jnp.asarray(_y_twiddles_inv(log_h))
            fri_input.append(
                _fold_kernel(
                    E, m, jnp.asarray(E.to_monty_np(bivariate_beta)),
                    inv_tw, log_h,
                )
            )

        folding = CircleFriFolding(E)

        def open_input_fn(indices, batcher):
            futs = []
            for data, _ in data_with_points:
                log_batch_max = max(
                    log2_strict(m.shape[0]) for m in data.matrices
                )
                # indices carry log_max bits (log_global + 1 extra bit)
                bits_reduced = log_max - log_batch_max
                futs.append(batcher.add(
                    self.mmcs, data, [i >> bits_reduced for i in indices]
                ))
            fl_fut = batcher.add(
                self.fri_mmcs, fl_data, [i >> 1 for i in indices]
            )

            def finish():
                input_openings = [
                    BatchMultiOpening(
                        opened_values=f.value[0], opening_proof=f.value[1]
                    )
                    for f in futs
                ]
                ext_pq, fl_proofs = fl_fut.value
                fl_sibs = []
                for index, ext_rows in zip(indices, ext_pq):
                    sibs = []
                    # rows per matrix in commit order (ascending
                    # log_height); sibling = other member of the pair
                    for log_h, row in zip(log_heights, ext_rows):
                        bits = log_max - log_h
                        b = (index >> bits) & 1
                        sibs.append(row[b ^ 1])
                    fl_sibs.append(sibs)
                return CircleInputProof(
                    input_openings=input_openings,
                    first_layer_siblings=fl_sibs,
                    first_layer_proofs=fl_proofs,
                )

            return finish

        fri_proof = prove_fri(
            E,
            self.fri,
            self.fri_mmcs,
            fri_input,
            challenger,
            log_max - 1,
            open_input_fn,
            folding=folding,
        )
        return opened_values, CirclePcsProof(
            first_layer_commitment=fl_data.commitment,
            lambdas=lambdas,
            fri_proof=fri_proof,
        )

    # ------------------------------------------------------------------
    def verify(self, commitments_with_opening_points, proof, challenger):
        """[(root, [(CircleDomain, [(zeta_uni, ys)])])] (pcs.rs:550)."""
        E = self.ext
        for _, mats in commitments_with_opening_points:
            for _, pv in mats:
                for _, ys in pv:
                    for y in ys:
                        challenger.observe_ext(y)

        alpha = challenger.sample_ext(E.D)
        challenger.observe_digest(proof.first_layer_commitment)
        bivariate_beta = challenger.sample_ext(E.D)

        # ascending committed heights (for lambdas / first-layer rows)
        log_heights = sorted(
            {
                dom.log_n + self.fri.log_blowup
                for (_, mats) in commitments_with_opening_points
                for (dom, _) in mats
            }
        )
        log_max = max(log_heights)
        if len(proof.lambdas) != len(log_heights):
            raise FriError("LambdaCountMismatch")

        fri_proof = proof.fri_proof
        log_global = (
            sum(s.log_arity for s in fri_proof.commit_phase_steps)
            + self.fri.log_blowup
            + self.fri.log_final_poly_len
        )
        if log_global != log_max - 1:
            raise FriError("GlobalMaxHeightMismatch")

        def open_inputs_fn(indices):
            ip = fri_proof.input_openings
            if not isinstance(ip, CircleInputProof):
                raise FriError("InputProofShapeMismatch")
            if len(ip.first_layer_siblings) != len(indices):
                raise FriError("FirstLayerSiblingCountMismatch")
            if len(ip.input_openings) != len(
                commitments_with_opening_points
            ):
                raise FriError("InputProofBatchCountMismatch")

            # authenticate input commitments per query
            for opening, (commit, mats) in zip(
                ip.input_openings, commitments_with_opening_points
            ):
                heights = [
                    dom.size << self.fri.log_blowup for (dom, _) in mats
                ]
                dims = []
                for h, (_, pv) in zip(heights, mats):
                    if not pv:
                        raise FriError("MatrixWithoutOpeningPoints")
                    dims.append((h, len(pv[0][1])))
                log_batch_max = log2_strict(max(heights))
                bits_reduced = log_max - log_batch_max
                ok = self.mmcs.verify_multi_batch(
                    commit,
                    dims,
                    [index >> bits_reduced for index in indices],
                    opening.opened_values,
                    opening.opening_proof,
                )
                if not ok:
                    raise FriError("InputMmcsError")

            all_fri_inputs = []
            fl_rows_by_query = []
            fl_dims = [
                (1 << (log_h - 1), 2) for log_h in log_heights
            ]
            for q, index in enumerate(indices):
                # log_h -> (alpha_offset, ro)
                ros: dict = {}
                for opening, (commit, mats) in zip(
                    ip.input_openings, commitments_with_opening_points
                ):
                    for ps_at_x, (dom, pv) in zip(
                        opening.opened_values[q], mats
                    ):
                        log_h = dom.log_n + self.fri.log_blowup
                        bits_reduced = log_max - log_h
                        orig_idx = cfft_permute_index(
                            index >> bits_reduced, log_h
                        )
                        x = CircleDomain.standard(log_h).nth_point(
                            orig_idx
                        )
                        off, ro = ros.setdefault(
                            log_h, (E.one_h(), E.zero_h())
                        )
                        w = len(ps_at_x)
                        alpha_pw = E.exp_h(alpha, w)
                        for zeta_uni, ps_at_zeta in pv:
                            if len(ps_at_zeta) != w:
                                raise FriError("InputShapeError")
                            zeta = ept_from_projective_line(E, zeta_uni)
                            # v_p(zeta) at x: diff = x - zeta
                            dx = E.add_h(
                                E.base_mul_h(x[0], zeta[0]),
                                E.base_mul_h(x[1], zeta[1]),
                            )
                            dy = E.sub_h(
                                E.base_mul_h(x[1], zeta[0]),
                                E.base_mul_h(x[0], zeta[1]),
                            )
                            re = E.sub_h(E.one_h(), dx)
                            im = E.neg_h(dy)
                            denom = E.add_h(
                                E.mul_h(re, re), E.mul_h(im, im)
                            )
                            if denom == E.zero_h():
                                raise FriError(
                                    "OpeningPointMatchesQueryPoint"
                                )
                            vp_num = E.sub_h(re, E.mul_h(alpha_pw, im))
                            # constraint part: Σ α^j (p_j(x) - p_j(zeta))
                            cpart = E.zero_h()
                            ap = E.one_h()
                            for px_j, pz_j in zip(ps_at_x, ps_at_zeta):
                                diff = E.sub_h(E.from_base_h(px_j), pz_j)
                                cpart = E.add_h(
                                    cpart, E.mul_h(ap, diff)
                                )
                                ap = E.mul_h(ap, alpha)
                            q_row = E.mul_h(
                                E.mul_h(vp_num, E.inv_h(denom)), cpart
                            )
                            off, ro = ros[log_h]
                            ro = E.add_h(ro, E.mul_h(off, q_row))
                            off = E.mul_h(off, E.mul_h(alpha_pw, alpha_pw))
                            ros[log_h] = (off, ro)

                # lambda correction + y-fold per height
                fri_input = []
                fl_row_values = []
                sibs = ip.first_layer_siblings[q]
                if len(sibs) != len(log_heights):
                    raise FriError("FirstLayerSiblingCountMismatch")
                for (log_h, lam, fl_sib) in zip(
                    log_heights, proof.lambdas, sibs
                ):
                    if log_h not in ros:
                        raise FriError("MissingReducedOpening")
                    _, ro = ros[log_h]
                    orig_size = log_h - self.fri.log_blowup
                    bits_reduced = log_max - log_h
                    b = (index >> bits_reduced) & 1
                    orig_idx = cfft_permute_index(
                        index >> bits_reduced, log_h
                    )
                    p = CircleDomain.standard(log_h).nth_point(orig_idx)
                    corrected = E.sub_h(
                        ro, E.base_mul_h(pt_v_n(p[0], orig_size), lam)
                    )
                    fl_values = [corrected, corrected]
                    fl_values[b ^ 1] = tuple(fl_sib)
                    y_tw = p[1] if b == 0 else (_P - p[1]) % _P
                    t_inv = pow(y_tw, _P - 2, _P)
                    e0, e1 = fl_values
                    s = E.add_h(e0, e1)
                    d = E.mul_h(
                        E.base_mul_h(t_inv, E.sub_h(e0, e1)),
                        bivariate_beta,
                    )
                    folded = E.base_mul_h(_INV2, E.add_h(s, d))
                    fri_input.append((log_h - 1, folded))
                    fl_row_values.append(
                        [c for v in fl_values for c in v]
                    )
                fri_input.sort(key=lambda t: -t[0])
                all_fri_inputs.append(fri_input)
                fl_rows_by_query.append(fl_row_values)
            # authenticate every query's first-layer pair rows at once
            ok = self.fri_mmcs.inner.verify_multi_batch(
                proof.first_layer_commitment,
                [(h, 2 * E.D) for (h, _) in fl_dims],
                [index >> 1 for index in indices],
                fl_rows_by_query,
                ip.first_layer_proofs,
            )
            if not ok:
                raise FriError("FirstLayerMmcsError")
            return all_fri_inputs

        verify_fri(
            E,
            self.fri,
            fri_proof,
            challenger,
            None,
            self.mmcs,
            self.fri_mmcs,
            folding=CircleFriFolding(E),
            open_inputs_fn=open_inputs_fn,
            alpha=alpha,
            check_global_height=False,
        )
