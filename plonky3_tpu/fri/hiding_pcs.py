"""HidingFriPcs — the ZK wrapper around TwoAdicFriPcs.

Mirror of `fri/src/hiding_pcs.rs:30,110-136`: `commit` interleaves every
matrix with random rows (doubling its height to match the caller's
extended domain) and appends `num_random_codewords` random columns; `open`
returns the random codewords' openings separately (the reference's
"first item"). Combined with a hiding MMCS (salted leaves) and the
uni-stark random-poly commitment (prover.rs:259-274) this gives the
reference's full ZK story.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..utils.bits import log2_strict
from .two_adic_pcs import TwoAdicFriPcs


@dataclass(frozen=True)
class HidingFriPcs:
    inner: TwoAdicFriPcs
    num_random_codewords: int
    rng: np.random.Generator = field(
        default_factory=lambda: np.random.default_rng()
    )

    ZK = True

    @property
    def F(self):
        return self.inner.F

    @property
    def E(self):
        return self.inner.E

    @property
    def fri(self):
        return self.inner.fri

    @property
    def mmcs(self):
        return self.inner.mmcs

    def natural_domain_for_degree(self, degree: int):
        return self.inner.natural_domain_for_degree(degree)

    def log_max_lde_height(self):
        return getattr(
            self.inner, "log_max_lde_height", lambda: self.F.TWO_ADICITY
        )()

    # ------------------------------------------------------------------
    def commit(self, evaluations):
        """[(domain, (h, w) mat)] with domain.size == 2·h: interleave
        random rows and append random columns (hiding_pcs.rs:114-133)."""
        F = self.F
        nrc = self.num_random_codewords
        randomized = []
        for domain, mat in evaluations:
            h, w = mat.shape
            assert domain.size == 2 * h, "ZK commit needs the doubled domain"
            rand = jnp.asarray(
                F.to_monty_np(
                    self.rng.integers(
                        0, F.P, size=(h, w + 2 * nrc), dtype=np.uint64
                    )
                )
            )
            wide = jnp.concatenate([mat, rand], axis=1)  # (h, 2w + 2nrc)
            reshaped = wide.reshape(2 * h, w + nrc)
            randomized.append((domain, reshaped))
        data = self.inner.commit(randomized)
        data.zk_randomized = True
        return data

    def commit_preprocessing(self, evaluations):
        """Zero-pad instead of randomizing (hiding_pcs.rs:138-153)."""
        padded = []
        for domain, mat in evaluations:
            h, w = mat.shape
            zeros = jnp.zeros((h, w), jnp.uint32)
            wide = jnp.concatenate([mat, zeros], axis=1)
            padded.append((domain, wide.reshape(2 * h, w)))
        return self.inner.commit(padded)

    def get_evaluations_on_domain(self, data, mat_index, domain):
        """Inner evaluations, random codeword columns truncated
        (HorizontallyTruncated in the reference)."""
        full = self.inner.get_evaluations_on_domain(data, mat_index, domain)
        if self.num_random_codewords:
            return full[:, : full.shape[1] - self.num_random_codewords]
        return full

    def get_opt_randomization_poly_commitment(self, ext_domain):
        """D base-field random polys over the extended domain — the FRI
        batch randomizer R (prover.rs:259-274)."""
        F, E = self.F, self.E
        n = ext_domain.size
        vals = jnp.asarray(
            F.to_monty_np(
                self.rng.integers(0, F.P, size=(n, E.D), dtype=np.uint64)
            )
        )
        data = self.inner.commit([(ext_domain, vals)])
        data.zk_randomized = False  # R is opened in full (no codeword split)
        return data.root_std, data

    # ------------------------------------------------------------------
    def open(self, data_with_points, challenger, spans=None):
        """Returns ((random_codeword_openings, opened_values), FriProof).

        random_codeword_openings[round][mat][point] — the trailing
        `num_random_codewords` column evals, split out of the inner
        openings (hiding_pcs.rs open: "first item")."""
        opened, proof = self.inner.open(data_with_points, challenger,
                                        spans=spans)
        nrc = self.num_random_codewords
        rand_out, real_out = [], []
        for rnd_idx, (rnd, (data, _)) in enumerate(
            zip(opened, data_with_points)
        ):
            is_randomized = getattr(data, "zk_randomized", False)
            rand_round, real_round = [], []
            for mat_vals in rnd:
                rand_mat, real_mat = [], []
                for ys in mat_vals:
                    if nrc and is_randomized:
                        real_mat.append(ys[: len(ys) - nrc])
                        rand_mat.append(ys[len(ys) - nrc :])
                    else:
                        real_mat.append(ys)
                        rand_mat.append([])
                rand_round.append(rand_mat)
                real_round.append(real_mat)
            rand_out.append(rand_round)
            real_out.append(real_round)
        return (rand_out, real_out), proof

    def verify(self, commitments_with_opening_points, rand_openings,
               proof, challenger):
        """Reassemble full claimed rows (real ‖ random codewords) and run
        the inner verification."""
        nrc = self.num_random_codewords
        full = []
        for (commit, mats), rand_round in zip(
            commitments_with_opening_points, rand_openings
        ):
            full_mats = []
            for (dom, pv), rand_mat in zip(mats, rand_round):
                full_pv = []
                for (z, ys), rand_ys in zip(pv, rand_mat):
                    full_pv.append((z, list(ys) + list(rand_ys)))
                full_mats.append((dom, full_pv))
            full.append((commit, full_mats))
        return self.inner.verify(full, proof, challenger)


    # ------------------------------------------------------------------
    def commit_quotient(self, quotient_domain, q_flat, num_chunks):
        """ZK quotient commitment (hiding_pcs.rs get_quotient_ldes:173,
        eprint 2024/1037 §4.2): each chunk's LDE (at blowup+1) is masked
        with v_{H_i}(X)·t_i(X); the t_i are random with the LAST chunk
        chosen so the zp-weighted recomposition at ζ is unchanged:
        Σ_i cis_i·t_i = 0 with cis_i = 1/Π_{j≠i} Z_j(first_i)."""
        import numpy as np

        from ..ops.ntt import coset_evals_from_coeffs, coset_lde_batch

        F, E = self.F, self.E
        assert num_chunks > 1, "num_chunks must be > 1 for hiding"
        sub_evals = quotient_domain.split_evals(num_chunks, q_flat)
        sub_domains = quotient_domain.split_domains(num_chunks)
        h = sub_evals[0].shape[0]
        w = sub_evals[0].shape[1]
        lb = self.fri.log_blowup + 1  # ZK quotient blowup doubling

        # cis (standard ints)
        dens = []
        for i, dom in enumerate(sub_domains):
            acc = 1
            fp = dom.first_point()
            for j, other in enumerate(sub_domains):
                if j == i:
                    continue
                acc = F.mul_h(acc, other.vanishing_poly_at_point_h(fp))
            dens.append(acc)
        cis = [F.inv_h(d) for d in dens]
        mul_coeffs = [F.mul_h(c, F.inv_h(cis[-1])) for c in cis[:-1]]

        rvs = [
            self.rng.integers(0, F.P, size=(h, w), dtype=np.uint64)
            for _ in range(num_chunks - 1)
        ]
        last = np.zeros((h, w), dtype=np.uint64)
        for t, mc in zip(rvs, mul_coeffs):
            last = (last + (F.P - mc) * t) % F.P
        rvs.append(last)

        ldes = []
        for dom, evals, rv in zip(sub_domains, sub_evals, rvs):
            shift = F.mul_h(F.GENERATOR, F.inv_h(dom.shift))
            lde = coset_lde_batch(F, evals, lb, shift)  # bitrev
            # mask coeffs: coeff[i] = -g^i·rv[i]; coeff[h+i] = p·g^i·rv[i]
            p_const = F.exp_h(shift, h)
            gp = 1
            coeffs = np.zeros((h << lb, w), dtype=np.uint64)
            for i in range(h):
                row = (gp * rv[i]) % F.P
                coeffs[i] = (F.P - row) % F.P
                coeffs[h + i] = (p_const * row) % F.P
                gp = F.mul_h(gp, F.GENERATOR)
            import jax.numpy as jnp

            mask = coset_evals_from_coeffs(
                F, jnp.asarray(F.to_monty_np(coeffs)), 0, 1
            )  # plain subgroup DFT, bitrev out
            ldes.append(F.add(lde, mask))
        data = self.mmcs.commit(ldes)
        data.domains = list(sub_domains)
        # quotient chunks are NOT row-randomized — open() must not strip
        data.zk_randomized = False
        return data
