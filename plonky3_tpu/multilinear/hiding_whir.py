"""HVZK WHIR — the hiding multilinear PCS (whir/src/pcs/zk/mod.rs).

TPU-native realization of the reference's HVZK-WHIR composition
(eprint 2026/391):

  commit : zero-knowledge Reed–Solomon encoding of the witness — the
           MLE coefficient vector is extended by one variable whose
           set-branch holds `t` uniformly random coefficients
           ([[zk-codes]] `ReedSolomonZkEncoding` layout: coefficients
           [g || r_t || 0] over a doubled cube), so any `t` codeword
           positions reveal nothing about g (`zk-codes/src/encoding.rs`).
           Evaluating the extended MLE at (point, 0) kills every
           randomness coefficient (their top index bit is 1) and yields
           exactly g(point).
  open   : one-time code-switch (`whir/src/pcs/zk/code_switch.rs`
           Construction 9.7): commit a fully-random mask polynomial M
           over the extended cube, reveal v_m = M(point, 0), sample rho,
           and run the plain WHIR folding on h = G + rho·M with claim
           value + rho·v_m. Every sumcheck wire, OOD answer and
           later-round codeword derives from h, which is uniform given
           the one-time mask; round-0 queries open BOTH commitments
           (<= t positions of G's zk codeword — inside the simulation
           budget) and the verifier recombines g + rho·m itself.

HVZK: the verifier's view is (com_G, com_M, v_m, rho, WHIR transcript
of h). A simulator samples h uniformly, sets v_m := (h(point,0) −
value)/rho, simulates G's query answers uniformly (zk-codes simulate)
and computes M's rows as (h_row − g_row)/rho — identically distributed.
The leakage test in tests/test_hiding_whir.py checks two openings of
the same statement share nothing beyond the claimed value.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops.ntt import coset_evals_from_coeffs
from ..utils.bits import log2_strict
from .whir import (
    WhirConfig,
    WhirError,
    WhirPcs,
    eval_multilinear_coeffs,
    evals_to_coeffs_np,
)


@dataclass
class _PairedTrees:
    """Round-0 oracle of the code-switched WHIR run."""

    tree_g: object
    tree_m: object
    rho: tuple


@dataclass
class _PairedCommit:
    commit_g: tuple
    commit_m: tuple
    rho: tuple


@dataclass
class HidingWhirData:
    coeffs_zk: np.ndarray  # (2^{n+1},) standard-form base coefficients
    tree: object
    n_vars: int  # of the WITNESS g (committed object has n_vars+1)


@dataclass
class HidingWhirProof:
    mask_commit: tuple
    v_mask: tuple
    inner: object  # WhirProof over h = G + rho*M


class HidingWhirPcs(WhirPcs):
    """Hiding wrapper; `config` applies to the EXTENDED (n+1)-variable
    polynomial, i.e. config.num_rounds(n_vars + 1) must be integral."""

    ZK = True

    def commit_hiding_coeffs(self, coeffs_std: np.ndarray, rng,
                             t: int = None):
        """Commit a multilinear given its COEFFICIENT vector (the mask
        oracle of the masked sumcheck stores per-round univariate mask
        coefficients, whose arbitrary-point evaluations are MLE
        evaluations at power points — whir's univariate/multilinear
        correspondence)."""
        from .whir import coeffs_to_evals_ext

        F, E = self.F, self.E
        ev = coeffs_to_evals_ext(
            E, [E.from_base_h(int(c)) for c in coeffs_std]
        )
        evals = np.asarray([int(v[0]) for v in ev], np.uint32)
        return self.commit_hiding(evals, rng, t=t)

    def commit_hiding(self, evals_std: np.ndarray, rng,
                      t: int = None):
        from ..utils.bits import bitrev_permute_axis0
        from .zk_codes import ReedSolomonZkEncoding

        F, cfg = self.F, self.config
        n = log2_strict(evals_std.shape[0])
        if t is None:
            # query budget: round-0 spot checks hit t distinct coset
            # groups of 2^k positions each
            t = (1 << cfg.folding_factor) * (
                cfg.queries_at(0) + cfg.ood_at(0) + 2
            )
        assert t <= (1 << n), "randomness budget exceeds the spare cube"
        coeffs_g = evals_to_coeffs_np(F, evals_std)
        # the zk-codes component defines the randomized layout
        # [msg || r_t || 0] and its codeword (zk_codes.py)
        enc = ReedSolomonZkEncoding(
            F=F, t=t, msg_len=1 << n,
            log_m=n + 1 + cfg.log_blowup, shift_std=F.GENERATOR,
        )
        r = enc.sample_randomness(rng)
        zk = np.zeros(1 << (n + 1), np.uint32)
        zk[: 1 << n] = coeffs_g
        zk[(1 << n) : (1 << n) + t] = r
        cw_nat = enc.encode_with_randomness(coeffs_g, r)
        codeword = bitrev_permute_axis0(
            jnp.asarray(F.to_monty_np(cw_nat)).reshape(-1, 1),
            n + 1 + cfg.log_blowup,
        )
        leaves = codeword.reshape(-1, 1 << cfg.folding_factor)
        tree = self.mmcs.commit([leaves])
        return tree.root_std, HidingWhirData(
            coeffs_zk=zk, tree=tree, n_vars=n
        )

    # ------------------------------------------------------------------
    def open_hiding(self, data: HidingWhirData, point: list, challenger,
                    rng):
        """Prove g(point) in HVZK. Caller observes commitment, point and
        the claimed value first. Returns (value, HidingWhirProof)."""
        F, E, cfg = self.F, self.E, self.config
        n1 = data.n_vars + 1
        point_p = list(point) + [E.zero_h()]

        coeffs_zk = [E.from_base_h(int(c)) for c in data.coeffs_zk]
        value = eval_multilinear_coeffs(E, coeffs_zk, point_p)

        # one-time mask: fully random EXT polynomial over the extended
        # cube, committed as an ext codeword
        m_std = np.stack(
            [F.rand_np(rng, (1 << n1,), monty=False) for _ in range(E.D)],
            axis=1,
        )
        mask_coeffs = [tuple(int(x) for x in row) for row in m_std]
        m_cw = self._encode_ext(mask_coeffs, n1 + cfg.log_blowup)
        tree_m = self.fri_mmcs.commit_ext_matrices(
            [m_cw.reshape(-1, 1 << cfg.folding_factor, E.D)]
        )
        challenger.observe_digest(tree_m.root_std)
        v_mask = eval_multilinear_coeffs(E, mask_coeffs, point_p)
        challenger.observe_ext(v_mask)
        rho = challenger.sample_ext(E.D)

        h_coeffs = [
            E.add_h(g, E.mul_h(rho, m))
            for g, m in zip(coeffs_zk, mask_coeffs)
        ]
        h_value = E.add_h(value, E.mul_h(rho, v_mask))
        paired = _PairedTrees(
            tree_g=data.tree, tree_m=tree_m, rho=rho
        )
        inner = self._open_core(
            h_coeffs, point_p, h_value, challenger, paired,
            n1 + cfg.log_blowup, "paired",
        )
        return value, HidingWhirProof(
            mask_commit=tree_m.root_std, v_mask=v_mask, inner=inner
        )

    def open_hiding_multi(self, data: HidingWhirData, points_scales,
                          claim, challenger, rng):
        """HVZK batched opening of a weighted multi-point statement
        Σ_i scale_i·g(p_i) = claim (the masked-sumcheck mask oracle).
        Returns HidingWhirProof; the claim itself is the caller's."""
        F, E, cfg = self.F, self.E, self.config
        n1 = data.n_vars + 1
        cons_p = [
            (list(p) + [E.zero_h()], sc) for p, sc in points_scales
        ]
        coeffs_zk = [E.from_base_h(int(c)) for c in data.coeffs_zk]

        m_std = np.stack(
            [F.rand_np(rng, (1 << n1,), monty=False) for _ in range(E.D)],
            axis=1,
        )
        mask_coeffs = [tuple(int(x) for x in row) for row in m_std]
        m_cw = self._encode_ext(mask_coeffs, n1 + cfg.log_blowup)
        tree_m = self.fri_mmcs.commit_ext_matrices(
            [m_cw.reshape(-1, 1 << cfg.folding_factor, E.D)]
        )
        challenger.observe_digest(tree_m.root_std)
        v_mask = E.zero_h()
        for p, sc in cons_p:
            v_mask = E.add_h(
                v_mask,
                E.mul_h(sc, eval_multilinear_coeffs(E, mask_coeffs, p)),
            )
        challenger.observe_ext(v_mask)
        rho = challenger.sample_ext(E.D)

        h_coeffs = [
            E.add_h(g, E.mul_h(rho, m))
            for g, m in zip(coeffs_zk, mask_coeffs)
        ]
        h_claim = E.add_h(claim, E.mul_h(rho, v_mask))
        paired = _PairedTrees(
            tree_g=data.tree, tree_m=tree_m, rho=rho
        )
        inner = self._open_core(
            h_coeffs, None, h_claim, challenger, paired,
            n1 + cfg.log_blowup, "paired", init_constraints=cons_p,
        )
        return HidingWhirProof(
            mask_commit=tree_m.root_std, v_mask=v_mask, inner=inner
        )

    def verify_hiding_multi(self, commitment, n_vars: int, points_scales,
                            claim, proof: HidingWhirProof, challenger):
        E, cfg = self.E, self.config
        n1 = n_vars + 1
        cons_p = [
            (list(p) + [E.zero_h()], sc) for p, sc in points_scales
        ]
        challenger.observe_digest(proof.mask_commit)
        challenger.observe_ext(proof.v_mask)
        rho = challenger.sample_ext(E.D)
        h_claim = E.add_h(claim, E.mul_h(rho, proof.v_mask))
        paired = _PairedCommit(
            commit_g=commitment, commit_m=proof.mask_commit, rho=rho
        )
        self._verify_core(
            paired, n1, None, h_claim, proof.inner, challenger,
            n1 + cfg.log_blowup, "paired", init_constraints=cons_p,
        )

    # ------------------------------------------------------------------
    def verify_hiding(self, commitment, n_vars: int, point: list, value,
                      proof: HidingWhirProof, challenger):
        E, cfg = self.E, self.config
        n1 = n_vars + 1
        point_p = list(point) + [E.zero_h()]
        challenger.observe_digest(proof.mask_commit)
        challenger.observe_ext(proof.v_mask)
        rho = challenger.sample_ext(E.D)
        h_value = E.add_h(value, E.mul_h(rho, proof.v_mask))
        paired = _PairedCommit(
            commit_g=commitment, commit_m=proof.mask_commit, rho=rho
        )
        self._verify_core(
            paired, n1, point_p, h_value, proof.inner, challenger,
            n1 + cfg.log_blowup, "paired",
        )
