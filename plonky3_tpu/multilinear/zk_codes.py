"""Randomized Reed–Solomon encodings for ZK variants — the `zk-codes`
crate as a standalone component (zk-codes/src/{encoding,reed_solomon}.rs;
eprint 2026/391 §3.2.1).

A codeword is the RS evaluation of the coefficient vector
[message || randomness_t || 0-pad] over a 2^log_m point domain: the t
uniformly random coefficients make ANY t codeword positions jointly
uniform (perfect simulation, MDS property), so spot-check style query
protocols reveal nothing about the message within the query budget.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops.ntt import coset_evals_from_coeffs
from ..utils.bits import log2_strict


@dataclass(frozen=True)
class ReedSolomonZkEncoding:
    """zk-codes/src/reed_solomon.rs:40 — parameters of one encoding."""

    F: object  # base field (Monty31)
    t: int  # query budget = number of random coefficients
    msg_len: int
    log_m: int  # codeword length = 2^log_m
    shift_std: int = 1  # evaluation coset shift (1 = the subgroup)

    def __post_init__(self):
        assert self.msg_len + self.t <= (1 << self.log_m), (
            "message + randomness exceed codeword length"
        )

    @property
    def codeword_len(self) -> int:
        return 1 << self.log_m

    @property
    def randomness_len(self) -> int:
        return self.t

    @property
    def query_bound(self) -> int:
        return self.t

    def sample_randomness(self, rng) -> np.ndarray:
        return self.F.rand_np(rng, (self.t,), monty=False)

    def encode_with_randomness(self, msg_std, randomness_std):
        """Codeword (natural order, standard form, device) of
        [msg || randomness || 0] (reed_solomon.rs:175)."""
        F = self.F
        m = self.codeword_len
        msg_std = np.asarray(msg_std, np.uint32)
        randomness_std = np.asarray(randomness_std, np.uint32)
        assert msg_std.shape[0] == self.msg_len
        assert randomness_std.shape[0] == self.t
        coeffs = np.zeros(m, np.uint32)
        coeffs[: self.msg_len] = msg_std
        coeffs[self.msg_len : self.msg_len + self.t] = randomness_std
        blow = self.log_m - log2_strict(len(coeffs))  # 0: full-length DFT
        cw_br = coset_evals_from_coeffs(
            F, jnp.asarray(F.to_monty_np(coeffs)).reshape(-1, 1),
            blow, self.shift_std,
        )
        from ..utils.bits import bitrev_permute_axis0

        cw = bitrev_permute_axis0(cw_br, self.log_m)[:, 0]
        return F.from_monty_np(np.asarray(cw))

    def encode(self, msg_std, rng):
        return self.encode_with_randomness(
            msg_std, self.sample_randomness(rng)
        )

    def simulate(self, query_set, rng) -> np.ndarray:
        """Identically distributed values at <= t distinct positions,
        without the message (encoding.rs:58)."""
        out = np.zeros(len(query_set), np.uint32)
        cache = {}
        for i, p in enumerate(query_set):
            if p not in cache:
                cache[p] = int(self.F.rand_np(rng, (1,), monty=False)[0])
            out[i] = cache[p]
        assert len(cache) <= self.t, "more distinct positions than budget"
        return out
