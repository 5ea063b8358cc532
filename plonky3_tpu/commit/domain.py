"""Two-adic multiplicative coset domains (PolynomialSpace).

Mirrors `commit/src/domain.rs:54` + `field/src/coset.rs:55` semantics:
a domain is the coset `shift·H` for the unique two-adic subgroup H of size
2^log_n. Host methods use exact ints / ext tuples (verifier side); the
device method produces selector arrays for the quotient evaluation.

Key formulas (domain.rs):
  vanishing  Z_{gH}(X) = (X/g)^|H| - 1
  selectors_at_point: first = Z/(X/g - 1), last = Z/(X/g - h^{-1}),
                      transition = X/g - h^{-1}, inv_vanishing = 1/Z
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..fields.monty31 import Monty31
from ..fields.extension import BinomialExtension
from ..ops.ntt import powers_device


@dataclass(frozen=True)
class TwoAdicCoset:
    F: Monty31
    shift: int  # standard form
    log_n: int

    @property
    def size(self) -> int:
        return 1 << self.log_n

    @property
    def gen(self) -> int:
        """Generator h of the subgroup H."""
        return self.F.two_adic_generator_h(self.log_n)

    def first_point(self) -> int:
        return self.shift

    def next_point_ext(self, E: BinomialExtension, x):
        """x -> h·x for extension point x (host tuple)."""
        return E.base_mul_h(self.gen, x)

    def create_disjoint_domain(self, min_size: int) -> "TwoAdicCoset":
        """Coset `shift·GENERATOR·K`, |K| = next_pow2(min_size)
        (domain.rs try_create_disjoint_domain)."""
        log_k = (min_size - 1).bit_length()
        if log_k > self.F.TWO_ADICITY:
            raise ValueError("min_size exceeds two-adicity")
        return TwoAdicCoset(
            self.F, self.F.mul_h(self.shift, self.F.GENERATOR), log_k
        )

    def split_domains(self, num_chunks: int) -> list:
        """gH -> [gK, ghK, gh^2 K, ...], K = H^num_chunks (domain.rs)."""
        log_c = num_chunks.bit_length() - 1
        assert 1 << log_c == num_chunks and log_c <= self.log_n
        h = self.gen
        return [
            TwoAdicCoset(
                self.F,
                self.F.mul_h(self.shift, self.F.exp_h(h, i)),
                self.log_n - log_c,
            )
            for i in range(num_chunks)
        ]

    def split_evals(self, num_chunks: int, evals):
        """Row i of chunk c = row i*num_chunks + c of `evals` (natural
        order) — the interleaved decomposition matching split_domains."""
        n, w = evals.shape[0], evals.shape[1:]
        return [evals[c::num_chunks] for c in range(num_chunks)]

    # ------------------------------------------------------------------
    # host (verifier) scalar selectors, over the extension field
    # ------------------------------------------------------------------
    def vanishing_poly_at_point_ext(self, E: BinomialExtension, point):
        sp = E.base_mul_h(self.F.inv_h(self.shift), point)
        return E.sub_h(E.exp_h(sp, self.size), E.one_h())

    def vanishing_poly_at_point_h(self, point: int) -> int:
        """Z_{gH}(x) = (x/g)^|H| − 1 for a base-field point (host)."""
        F = self.F
        return F.sub_h(
            F.exp_h(F.mul_h(F.inv_h(self.shift), point), self.size), 1
        )

    def selectors_at_point_ext(self, E: BinomialExtension, point):
        sp = E.base_mul_h(self.F.inv_h(self.shift), point)
        z_h = E.sub_h(E.exp_h(sp, self.size), E.one_h())
        h_inv = self.F.inv_h(self.gen)
        first_den = E.sub_h(sp, E.one_h())
        last_den = E.sub_h(sp, E.from_base_h(h_inv))
        return dict(
            is_first_row=E.mul_h(z_h, E.inv_h(first_den)),
            is_last_row=E.mul_h(z_h, E.inv_h(last_den)),
            is_transition=last_den,
            inv_vanishing=E.inv_h(z_h),
        )

    # ------------------------------------------------------------------
    # device selectors over a disjoint coset (prover quotient path)
    # ------------------------------------------------------------------
    def selectors_on_coset_device(self, coset: "TwoAdicCoset"):
        """Selector arrays at every point of `coset`, natural order
        (domain.rs selectors_on_coset; requires self.shift == 1)."""
        F = self.F
        assert self.shift == 1 and coset.shift != 1
        assert coset.log_n >= self.log_n
        rate_bits = coset.log_n - self.log_n
        n, N = self.size, coset.size

        # coset points x_i = s·g_N^i, natural order
        xs = powers_device(F, coset.gen, N, scale_std=coset.shift)
        # Z_H(x_i) = s^n·g_N^{i·n} - 1, period 2^rate_bits
        s_pow_n = F.exp_h(coset.shift, n)
        zh_period = powers_device(
            F, F.two_adic_generator_h(rate_bits), 1 << rate_bits,
            scale_std=s_pow_n,
        )
        one = F.const(1)
        zh_period = F.sub(zh_period, jnp.broadcast_to(one, zh_period.shape))
        zh = jnp.tile(zh_period, n)
        inv_vanishing = F.inv(zh_period)  # invert only the period
        inv_vanishing = jnp.tile(inv_vanishing, n)

        h_inv = F.inv_h(self.gen)
        first_den = F.sub(xs, jnp.broadcast_to(one, xs.shape))
        last_den = F.sub(xs, jnp.broadcast_to(F.const(h_inv), xs.shape))
        is_first_row = F.mul(zh, F.inv(first_den))
        is_last_row = F.mul(zh, F.inv(last_den))
        return dict(
            is_first_row=is_first_row,
            is_last_row=is_last_row,
            is_transition=last_den,
            inv_vanishing=inv_vanishing,
        )
