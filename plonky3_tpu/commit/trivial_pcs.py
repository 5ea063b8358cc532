"""TrivialPcs — the test PCS (commit/src/testing.rs:18).

The "commitment" is the polynomial itself: coefficient vectors in the
clear, observed into the transcript. Openings are direct coefficient
evaluations and the verifier recomputes them exactly. Exists to isolate
the STARK layers from FRI in tests, same as the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..commit.domain import TwoAdicCoset
from ..ops.ntt import idft
from ..utils.bits import log2_strict


@dataclass
class TrivialProverData:
    domains: list
    mats: list  # committed natural-order device evals
    coeffs_std: list  # [matrix] -> (n, w) numpy standard coefficients
    root_std: tuple  # flat coefficient list stands in for a digest


@dataclass(frozen=True)
class TrivialPcs:
    F: object
    E: object
    fri: object  # FriParameters (log_blowup used for domain sizing only)

    def natural_domain_for_degree(self, degree: int) -> TwoAdicCoset:
        return TwoAdicCoset(self.F, 1, log2_strict(degree))

    def commit(self, evaluations):
        F = self.F
        domains, mats, coeffs = [], [], []
        flat = []
        for domain, evals in evaluations:
            assert evals.shape[0] == domain.size
            # interpolate over the domain: evals on shift·H -> coeffs
            mat = evals
            c = idft(F, mat)
            if domain.shift != 1:
                # rescale coeff_i by shift^{-i}
                inv_s = F.inv_h(domain.shift)
                sp = F.powers_np(inv_s, domain.size)
                c = F.mul(c, jnp.asarray(sp)[:, None])
            c_std = F.from_monty_np(np.asarray(c))
            domains.append(domain)
            mats.append(mat)
            coeffs.append(c_std)
            flat.extend(int(x) for x in c_std.reshape(-1))
        data = TrivialProverData(
            domains=domains, mats=mats, coeffs_std=coeffs,
            root_std=tuple(flat),
        )
        return data

    def get_evaluations_on_domain(self, data, idx, domain):
        F = self.F
        c_std = data.coeffs_std[idx]
        n, w = c_std.shape
        # evaluate on domain: pad coeffs, scale by shift powers, dft
        from ..ops.ntt import coset_lde_batch

        src = data.domains[idx]
        mat = data.mats[idx]
        added = domain.log_n - src.log_n
        shift = F.mul_h(domain.shift, F.inv_h(src.shift))
        return coset_lde_batch(
            F, mat, added, shift, out_order="natural"
        )

    def open(self, data_with_points, challenger, spans=None):
        E, F = self.E, self.F
        opened = []
        for data, points in data_with_points:
            round_vals = []
            for c_std, pts in zip(data.coeffs_std, points):
                mat_vals = []
                for z in pts:
                    ys = []
                    for j in range(c_std.shape[1]):
                        acc = E.zero_h()
                        for i in range(c_std.shape[0] - 1, -1, -1):
                            acc = E.add_h(
                                E.mul_h(acc, z),
                                E.from_base_h(int(c_std[i, j])),
                            )
                        ys.append(acc)
                    for y in ys:
                        challenger.observe_ext(y)
                    mat_vals.append(ys)
                round_vals.append(mat_vals)
            opened.append(round_vals)
        return opened, None  # no opening proof needed

    def verify(self, commitments_with_opening_points, proof, challenger):
        """Recompute every claimed evaluation from the in-the-clear
        coefficients (the commitment) and compare."""
        E = self.E
        from ..fri.verifier import FriError

        for root, mats in commitments_with_opening_points:
            # reconstruct per-matrix coefficient arrays from the flat root
            widths_heights = []
            total = 0
            for dom, pv in mats:
                w = len(pv[0][1])
                widths_heights.append((dom.size, w))
                total += dom.size * w
            if len(root) != total:
                raise FriError("TrivialPcs: commitment size mismatch")
            off = 0
            for (dom, pv), (n, w) in zip(mats, widths_heights):
                c = np.array(
                    root[off : off + n * w], dtype=np.uint64
                ).reshape(n, w)
                off += n * w
                for z, ys in pv:
                    for y in ys:
                        challenger.observe_ext(y)
                    for j in range(w):
                        acc = E.zero_h()
                        for i in range(n - 1, -1, -1):
                            acc = E.add_h(
                                E.mul_h(acc, z),
                                E.from_base_h(int(c[i, j])),
                            )
                        if acc != ys[j]:
                            raise FriError(
                                "TrivialPcs: evaluation mismatch"
                            )
