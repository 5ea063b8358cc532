"""CM31 / QM31 — the extension tower over Mersenne-31.

CM31 = M31[i]/(i²+1) (`mersenne-31/src/complex.rs`); QM31 = CM31[u]/(u²-W)
with W = 2+i (`mersenne-31/src/qm31.rs:31`). A QM31 element is a trailing
axis of 4 uint32s [a.re, a.im, b.re, b.im] for a + b·u; host form is a
4-tuple of canonical ints. API mirrors BinomialExtension so FRI/uni-stark
code is field-generic.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .mersenne31 import Mersenne31 as F

_P = F.P


def _cm_mul_h(a, b):
    return (
        (a[0] * b[0] - a[1] * b[1]) % _P,
        (a[0] * b[1] + a[1] * b[0]) % _P,
    )


def _cm_inv_h(a):
    n = (a[0] * a[0] + a[1] * a[1]) % _P
    ni = pow(n, _P - 2, _P)
    return ((a[0] * ni) % _P, (-a[1] * ni) % _P)


@dataclass(frozen=True)
class QM31Field:
    D: int = 4

    @property
    def base(self):
        return F

    @property
    def name(self):
        return "QM31"

    # ---------------- host (4-tuples of canonical ints) ----------------
    def zero_h(self):
        return (0, 0, 0, 0)

    def one_h(self):
        return (1, 0, 0, 0)

    def from_base_h(self, x: int):
        return (x % _P, 0, 0, 0)

    def add_h(self, a, b):
        return tuple((x + y) % _P for x, y in zip(a, b))

    def sub_h(self, a, b):
        return tuple((x - y) % _P for x, y in zip(a, b))

    def neg_h(self, a):
        return tuple((-x) % _P for x in a)

    def base_mul_h(self, s: int, a):
        return tuple((s * x) % _P for x in a)

    def mul_h(self, a, b):
        x, y = (a[0], a[1]), (a[2], a[3])
        c, d = (b[0], b[1]), (b[2], b[3])
        ac = _cm_mul_h(x, c)
        bd = _cm_mul_h(y, d)
        w_bd = _cm_mul_h((2, 1), bd)  # W = 2 + i
        re = ((ac[0] + w_bd[0]) % _P, (ac[1] + w_bd[1]) % _P)
        ad = _cm_mul_h(x, d)
        bc = _cm_mul_h(y, c)
        im = ((ad[0] + bc[0]) % _P, (ad[1] + bc[1]) % _P)
        return (re[0], re[1], im[0], im[1])

    def inv_h(self, a):
        x, y = (a[0], a[1]), (a[2], a[3])
        # norm = x² - W·y² in CM31
        x2 = _cm_mul_h(x, x)
        wy2 = _cm_mul_h((2, 1), _cm_mul_h(y, y))
        n = ((x2[0] - wy2[0]) % _P, (x2[1] - wy2[1]) % _P)
        ni = _cm_inv_h(n)
        re = _cm_mul_h(x, ni)
        im = _cm_mul_h(((-y[0]) % _P, (-y[1]) % _P), ni)
        return (re[0], re[1], im[0], im[1])

    def exp_h(self, a, e: int):
        acc = self.one_h()
        cur = a
        while e:
            if e & 1:
                acc = self.mul_h(acc, cur)
            cur = self.mul_h(cur, cur)
            e >>= 1
        return acc

    def powers_np(self, a, count: int) -> np.ndarray:
        out = np.empty((count, 4), dtype=np.uint32)
        acc = self.one_h()
        for i in range(count):
            out[i] = acc
            acc = self.mul_h(acc, a)
        return out

    def to_monty_np(self, a):
        """Host ext tuple/array -> uint32 array (M31 has no Monty form)."""
        return (np.asarray(a, dtype=np.uint64) % np.uint64(_P)).astype(
            np.uint32
        )

    # ---------------- device ((..., 4) uint32) ----------------
    def from_base(self, x):
        z = jnp.zeros_like(x)
        return jnp.stack([x, z, z, z], axis=-1)

    def add(self, a, b):
        return F.add(a, b)

    def sub(self, a, b):
        return F.sub(a, b)

    def neg(self, a):
        return F.neg(a)

    def base_mul(self, s, a):
        return F.mul(s[..., None], a)

    def _cm_mul(self, ar, ai, br, bi):
        return (
            F.sub(F.mul(ar, br), F.mul(ai, bi)),
            F.add(F.mul(ar, bi), F.mul(ai, br)),
        )

    def mul(self, a, b):
        ar, ai, br2, bi2 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
        cr, ci, dr, di = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        acr, aci = self._cm_mul(ar, ai, cr, ci)
        bdr, bdi = self._cm_mul(br2, bi2, dr, di)
        # W·bd = (2+i)(p+qi) = (2p - q) + (p + 2q)i
        wbr = F.sub(F.double(bdr), bdi)
        wbi = F.add(bdr, F.double(bdi))
        rer = F.add(acr, wbr)
        rei = F.add(aci, wbi)
        adr, adi = self._cm_mul(ar, ai, dr, di)
        bcr, bci = self._cm_mul(br2, bi2, cr, ci)
        imr = F.add(adr, bcr)
        imi = F.add(adi, bci)
        return jnp.stack([rer, rei, imr, imi], axis=-1)

    def square(self, a):
        return self.mul(a, a)

    def inv(self, a):
        ar, ai, br2, bi2 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
        x2r, x2i = self._cm_mul(ar, ai, ar, ai)
        y2r, y2i = self._cm_mul(br2, bi2, br2, bi2)
        wyr = F.sub(F.double(y2r), y2i)
        wyi = F.add(y2r, F.double(y2i))
        nr = F.sub(x2r, wyr)
        ni_ = F.sub(x2i, wyi)
        # CM31 inverse of (nr + ni·i)
        den = F.add(F.square(nr), F.square(ni_))
        di = F.inv(den)
        invr = F.mul(nr, di)
        invi = F.mul(F.neg(ni_), di)
        rer, rei = self._cm_mul(ar, ai, invr, invi)
        imr, imi = self._cm_mul(F.neg(br2), F.neg(bi2), invr, invi)
        return jnp.stack([rer, rei, imr, imi], axis=-1)

    # ---------------- numpy tails ----------------
    def add_np(self, a, b):
        return F.add_np(a, b)

    def sub_np(self, a, b):
        return F.sub_np(a, b)

    def _cm_mul_np(self, ar, ai, br, bi):
        return (
            F.sub_np(F.mul_np(ar, br), F.mul_np(ai, bi)),
            F.add_np(F.mul_np(ar, bi), F.mul_np(ai, br)),
        )

    def mul_np(self, a, b):
        a = np.asarray(a)
        b = np.broadcast_to(np.asarray(b), a.shape)
        ar, ai, br2, bi2 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
        cr, ci, dr, di = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        acr, aci = self._cm_mul_np(ar, ai, cr, ci)
        bdr, bdi = self._cm_mul_np(br2, bi2, dr, di)
        wbr = F.sub_np(F.double_np(bdr), bdi)
        wbi = F.add_np(bdr, F.double_np(bdi))
        adr, adi = self._cm_mul_np(ar, ai, dr, di)
        bcr, bci = self._cm_mul_np(br2, bi2, cr, ci)
        return np.stack(
            [
                F.add_np(acr, wbr),
                F.add_np(aci, wbi),
                F.add_np(adr, bcr),
                F.add_np(adi, bci),
            ],
            axis=-1,
        )

    def base_mul_np(self, s, a):
        return F.mul_np(np.asarray(s)[..., None], np.asarray(a))


QM31 = QM31Field()
