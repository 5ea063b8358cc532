"""Circle-group FFT for Mersenne-31 (the CFFT of `circle/src/cfft.rs`).

M31 is not two-adic; its FFT domain is the unit circle x²+y²=1 (order
2^32-divisible). A `CircleDomain(log_n, shift)` is the twin-coset
{shift + k·g} ∪ {-shift + (k+1)·g}, g = generator(log_n-1), interleaved
(domain.rs:43-93). Values live in "cfft order": natural index i maps to
cfft row `cfft_permute_index(i)` (ordering.rs:9, an involution).

Transforms (cfft.rs):
  interpolate: DIF butterfly layers with INVERTED twiddles —
    layer 0: y-coords of bitrev(coset0);  layer 1: x-coords (every 2nd);
    layer i>=2: repeated x -> 2x²-1;  final scale by 1/n.
    Layer with b twiddles pairs rows j, j ^ (n/(2b)) sharing twiddle
    ts[b*j/n] (cfft.rs:274-280).
  evaluate: tile coefficients 2^added times (the Dup realization of
    zero-padding, cfft.rs:195-205), then DIT layers with b = 2^added..n/2.

Coefficient basis (cfft.rs circle_basis): index bit 0 = y, bit k>=1 =
π^{k-1}(x) where π(x) = 2x²-1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.mersenne31 import (
    CIRCLE_TWO_ADIC_GENERATORS,
    Mersenne31 as F,
)
from ..utils.bits import bitrev_indices, log2_strict

_P = F.P


# ---------------------------------------------------------------------------
# host points (x, y) as python-int tuples
# ---------------------------------------------------------------------------
def pt_add(a, b):
    return (
        (a[0] * b[0] - a[1] * b[1]) % _P,
        (a[0] * b[1] + a[1] * b[0]) % _P,
    )


def pt_neg(a):
    return (a[0], (-a[1]) % _P)


def pt_sub(a, b):
    return pt_add(a, pt_neg(b))


def pt_double(a):
    return ((2 * a[0] * a[0] - 1) % _P, (2 * a[0] * a[1]) % _P)


def pt_mul(a, k: int):
    acc = (1, 0)
    cur = a
    while k:
        if k & 1:
            acc = pt_add(acc, cur)
        cur = pt_double(cur)
        k >>= 1
    return acc


def pt_generator(i: int):
    """Generator of the order-2^i circle subgroup (complex.rs:16)."""
    return CIRCLE_TWO_ADIC_GENERATORS[i]


def pt_v_n(x: int, log_n: int) -> int:
    """v_n of a point given its x coordinate (point.rs:77)."""
    for _ in range(log_n - 1):
        x = (2 * x * x - 1) % _P
    return x


def cfft_permute_index(index: int, log_n: int) -> int:
    """ordering.rs:9 (involution)."""
    idx, lsb = index >> 1, index & 1
    if lsb:
        idx = (1 << log_n) - idx - 1
    r = 0
    for _ in range(log_n):
        r = (r << 1) | (idx & 1)
        idx >>= 1
    return r


def cfft_perm_indices(log_n: int) -> np.ndarray:
    return np.array(
        [cfft_permute_index(i, log_n) for i in range(1 << log_n)],
        dtype=np.int32,
    )


class CircleDomain:
    """Twin coset of size 2^log_n with a host shift point.

    Hashable by value: domains are jit static args (shape keys)."""

    def __init__(self, log_n: int, shift):
        self.log_n = log_n
        self.shift = shift

    def __eq__(self, other):
        return (
            isinstance(other, CircleDomain)
            and self.log_n == other.log_n
            and self.shift == other.shift
        )

    def __hash__(self):
        return hash((self.log_n, self.shift))

    @staticmethod
    def standard(log_n: int) -> "CircleDomain":
        return CircleDomain(log_n, pt_generator(log_n + 1))

    @property
    def size(self):
        return 1 << self.log_n

    def subgroup_generator(self):
        return pt_generator(self.log_n - 1)

    def coset0_points(self):
        g = self.subgroup_generator()
        p = self.shift
        out = []
        for _ in range(1 << (self.log_n - 1)):
            out.append(p)
            p = pt_add(p, g)
        return out

    def points_natural(self):
        """All 2^log_n points, natural (interleaved) order (domain.rs:73)."""
        g = self.subgroup_generator()
        half = 1 << (self.log_n - 1)
        out = []
        p0 = self.shift
        p1 = pt_sub(g, self.shift)
        for _ in range(half):
            out.append(p0)
            out.append(p1)
            p0 = pt_add(p0, g)
            p1 = pt_add(p1, g)
        return out

    def nth_point(self, idx: int):
        i, lsb = idx >> 1, idx & 1
        g = self.subgroup_generator()
        if lsb == 0:
            return pt_add(self.shift, pt_mul(g, i))
        return pt_add(pt_neg(self.shift), pt_mul(g, i + 1))

    def vanishing_poly_h(self, at_x_vn, log_n=None):
        """v_n(at) - v_n(shift), given v_n(at) precomputed by caller."""
        return (at_x_vn - pt_v_n(self.shift[0], self.log_n)) % _P

    # ------------------------------------------------------------------
    # PolynomialSpace surface (domain.rs:150-366) — makes CircleDomain a
    # drop-in for TwoAdicCoset in the generic uni-stark prover/verifier
    # ------------------------------------------------------------------
    def is_standard(self):
        return self.shift == pt_generator(self.log_n + 1)

    def first_point(self) -> int:
        """shift.to_projective_line() = y/(x+1) (domain.rs:152)."""
        return (self.shift[1] * pow(self.shift[0] + 1, _P - 2, _P)) % _P

    def create_disjoint_domain(self, min_size: int) -> "CircleDomain":
        assert self.is_standard()
        log_k = (min_size - 1).bit_length()
        if log_k == self.log_n:
            log_k += 1
        return CircleDomain.standard(log_k)

    def split_domains(self, num_chunks: int) -> list:
        assert self.is_standard()
        log_c = num_chunks.bit_length() - 1
        assert 1 << log_c == num_chunks and log_c <= self.log_n
        pts = self.points_natural()[:num_chunks]
        return [
            CircleDomain(self.log_n - log_c, p) for p in pts
        ]

    def split_evals(self, num_chunks: int, evals):
        """Forward-backward interleave (domain.rs:196-213,363): row i goes
        to chunk fb(i) with fb pattern 0 1 .. k-1 k-1 .. 1 0 repeating."""
        import jax.numpy as jnp

        n = evals.shape[0]
        k = num_chunks
        assert n % (2 * k) == 0
        blocks = evals.reshape((n // (2 * k), 2 * k) + evals.shape[1:])
        out = []
        for c in range(k):
            pair = jnp.stack(
                [blocks[:, c], blocks[:, 2 * k - 1 - c]], axis=1
            )
            out.append(pair.reshape((n // k,) + evals.shape[1:]))
        return out

    # ---- host (verifier) ext-point selectors ----
    def next_point_ext(self, E, t):
        """projective-line coordinate of point(t) + generator(log_n)."""
        p = ept_from_projective_line(E, t)
        g = pt_generator(self.log_n)
        x = E.sub_h(E.base_mul_h(g[0], p[0]), E.base_mul_h(g[1], p[1]))
        y = E.add_h(E.base_mul_h(g[1], p[0]), E.base_mul_h(g[0], p[1]))
        return E.mul_h(y, E.inv_h(E.add_h(x, E.one_h())))

    def vanishing_poly_at_point_ext(self, E, t):
        p = ept_from_projective_line(E, t)
        return E.sub_h(
            ept_v_n(E, p[0], self.log_n),
            E.from_base_h(pt_v_n(self.shift[0], self.log_n)),
        )

    def selectors_at_point_ext(self, E, t):
        """LagrangeSelectors at an ext point (domain.rs:219-246)."""
        at = ept_from_projective_line(E, t)
        neg_shift = pt_neg(self.shift)
        k = _s_p_at_p_host(neg_shift, self.log_n)
        z = E.sub_h(
            ept_v_n(E, at[0], self.log_n),
            E.from_base_h(pt_v_n(self.shift[0], self.log_n)),
        )
        den_shift = _v_tilde_p_ext(E, self.shift, at)
        den_negshift_k = E.base_mul_h(k, _v_tilde_p_ext(E, neg_shift, at))
        z_inv_dk = E.mul_h(z, E.inv_h(den_negshift_k))
        return dict(
            is_first_row=E.mul_h(z, E.inv_h(den_shift)),
            is_last_row=E.base_mul_h(k, z_inv_dk),
            is_transition=E.sub_h(E.one_h(), z_inv_dk),
            inv_vanishing=E.inv_h(z),
        )

    # ---- device (prover) selectors over a disjoint standard coset ----
    def selectors_on_coset_device(self, coset: "CircleDomain"):
        import jax.numpy as jnp

        vals = _selectors_on_coset_np(
            self.log_n, self.shift, coset.log_n, coset.shift
        )
        return {k: jnp.asarray(v) for k, v in vals.items()}


def _s_p_at_p_host(p, log_n: int) -> int:
    """point.rs:110: -(v_n_prod(log_n)·2^(2·log_n-1))·y."""
    x = p[0]
    if log_n >= 2:
        out = x
        for _ in range(log_n - 2):
            x = (2 * x * x - 1) % _P
            out = (out * x) % _P
    else:
        out = 1
    return (-(out * pow(2, 2 * log_n - 1, _P)) * p[1]) % _P


def _v_tilde_p_ext(E, p, at):
    """(at - p).to_projective_line() (point.rs:105)."""
    dx = E.add_h(E.base_mul_h(p[0], at[0]), E.base_mul_h(p[1], at[1]))
    dy = E.sub_h(E.base_mul_h(p[0], at[1]), E.base_mul_h(p[1], at[0]))
    return E.mul_h(dy, E.inv_h(E.add_h(dx, E.one_h())))


def ept_from_projective_line(E, t):
    t2 = E.mul_h(t, t)
    inv_denom = E.inv_h(E.add_h(E.one_h(), t2))
    return (
        E.mul_h(E.sub_h(E.one_h(), t2), inv_denom),
        E.mul_h(E.add_h(t, t), inv_denom),
    )


def ept_v_n(E, x, log_n: int):
    for _ in range(log_n - 1):
        xx = E.mul_h(x, x)
        x = E.sub_h(E.add_h(xx, xx), E.one_h())
    return x


# host vectorized numpy helpers for the prover-side coset selectors
def _pow_np(a: np.ndarray, e: int) -> np.ndarray:
    acc = np.ones_like(a)
    base = a.astype(np.uint64)
    while e:
        if e & 1:
            acc = (acc * base) % _P
        base = (base * base) % _P
        e >>= 1
    return acc


_SELECTOR_CACHE: dict = {}


def _selectors_on_coset_np(log_n, shift, coset_log_n, coset_shift):
    """Vectorized selectors_on_coset (domain.rs:262-320), cached np."""
    key = (log_n, shift, coset_log_n, coset_shift)
    out = _SELECTOR_CACHE.get(key)
    if out is not None:
        return out
    dom = CircleDomain(coset_log_n, coset_shift)
    pts = dom.points_natural()
    ax = np.array([p[0] for p in pts], dtype=np.uint64)
    ay = np.array([p[1] for p in pts], dtype=np.uint64)

    # z = v_n(at) - v_n(shift)
    x = ax.copy()
    for _ in range(log_n - 1):
        x = (2 * x * x + _P - 1) % _P
    z = (x + _P - pt_v_n(shift[0], log_n)) % _P

    def v_tilde(p):
        dx = (p[0] * ax + p[1] * ay) % _P
        dy = (p[0] * ay + (_P - p[1]) * ax) % _P
        return (dy * _pow_np((dx + 1) % _P, _P - 2)) % _P

    neg_shift = pt_neg(shift)
    k = _s_p_at_p_host(neg_shift, log_n)
    den_shift = v_tilde(shift)
    den_negshift_k = (v_tilde(neg_shift) * k) % _P
    inv_z = _pow_np(z, _P - 2)
    z_inv_dk = (z * _pow_np(den_negshift_k, _P - 2)) % _P
    out = dict(
        is_first_row=((z * _pow_np(den_shift, _P - 2)) % _P).astype(
            np.uint32
        ),
        is_last_row=((z_inv_dk * k) % _P).astype(np.uint32),
        is_transition=((1 + _P - z_inv_dk) % _P).astype(np.uint32),
        inv_vanishing=inv_z.astype(np.uint32),
    )
    _SELECTOR_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# twiddles (host precompute, cached)
# ---------------------------------------------------------------------------
_TWIDDLE_CACHE: dict = {}


def compute_twiddles(domain: CircleDomain):
    """Per-layer twiddle arrays [y (n/2), x (n/4), 2x²-1 (n/8), ...]
    (cfft.rs:553) as host uint32; cached per (log_n, shift)."""
    key = (domain.log_n, domain.shift)
    tw = _TWIDDLE_CACHE.get(key)
    if tw is None:
        pts = domain.coset0_points()
        br = bitrev_indices(domain.log_n - 1)
        pts = [pts[i] for i in br]
        layers = [np.array([p[1] for p in pts], dtype=np.uint32)]
        if domain.log_n >= 2:
            xs = np.array([p[0] for p in pts[::2]], dtype=np.uint32)
            layers.append(xs)
            for _ in range(domain.log_n - 2):
                prev = layers[-1][::2].astype(np.uint64)
                nxt = (2 * prev * prev + _P - 1) % np.uint64(_P)
                layers.append(nxt.astype(np.uint32))
        tw = layers
        _TWIDDLE_CACHE[key] = tw
    return tw


_INV_TWIDDLE_CACHE: dict = {}


def compute_inv_twiddles(domain: CircleDomain):
    key = (domain.log_n, domain.shift)
    tw = _INV_TWIDDLE_CACHE.get(key)
    if tw is None:
        tw = []
        for layer in compute_twiddles(domain):
            inv = np.array(
                [pow(int(t), _P - 2, _P) for t in layer], dtype=np.uint32
            )
            tw.append(inv)
        _INV_TWIDDLE_CACHE[key] = tw
    return tw


# ---------------------------------------------------------------------------
# transforms (device; values in cfft order along axis 0)
# ---------------------------------------------------------------------------
def _butterfly_layer(x, tw, dif: bool):
    """One layer: b = len(tw) twiddles, block size n/b, pairs block halves."""
    n = x.shape[0]
    b = tw.shape[0]
    rest = x.shape[1:]
    half = n // (2 * b)
    v = x.reshape((b, 2, half) + rest)
    lo, hi = v[:, 0], v[:, 1]
    t = jnp.asarray(tw).reshape((b, 1) + (1,) * len(rest))
    if dif:  # DifButterfly: (lo+hi, (lo-hi)·t)
        top = F.add(lo, hi)
        bot = F.mul(F.sub(lo, hi), t)
    else:  # DitButterfly: (lo+hi·t, lo-hi·t)
        ht = F.mul(hi, t)
        top = F.add(lo, ht)
        bot = F.sub(lo, ht)
    return jnp.stack([top, bot], axis=1).reshape(x.shape)


@partial(jax.jit, static_argnames=("log_n", "shift"))
def _interpolate_jit(values, log_n, shift):
    domain = CircleDomain(log_n, shift)
    x = values
    for tw in compute_inv_twiddles(domain):
        x = _butterfly_layer(x, tw, dif=True)
    n_inv = F.const(pow(1 << log_n, _P - 2, _P))
    return F.mul(x, n_inv)


def cfft_interpolate(domain: CircleDomain, values_cfft):
    """(n, w) cfft-order evaluations -> (n, w) natural-order coefficients."""
    return _interpolate_jit(values_cfft, domain.log_n, domain.shift)


@partial(jax.jit, static_argnames=("log_n", "shift"))
def _evaluate_jit(coeffs, log_n, shift):
    domain = CircleDomain(log_n, shift)
    n_small = coeffs.shape[0]
    added = log_n - log2_strict(n_small)
    x = jnp.tile(coeffs, (1 << added,) + (1,) * (coeffs.ndim - 1))
    layers = list(compute_twiddles(domain))[::-1]  # b = 1 .. n/2
    for tw in layers[added:]:
        x = _butterfly_layer(x, tw, dif=False)
    return x


def cfft_evaluate(domain: CircleDomain, coeffs):
    """(m, w) natural-order coeffs -> (n, w) cfft-order evaluations on
    `domain` (m <= n = domain.size; zero-padding via row duplication)."""
    return _evaluate_jit(coeffs, domain.log_n, domain.shift)


def circle_basis_host(point, log_n: int):
    """[basis_i(point)] in coefficient order (cfft.rs:575)."""
    b = [1, point[1]]
    x = point[0]
    for _ in range(log_n - 1):
        b.extend([(v * x) % _P for v in b])
        x = (2 * x * x - 1) % _P
    return b
