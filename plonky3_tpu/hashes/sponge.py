"""Sponge hashers and compression functions over Poseidon2.

Behavioral parity with `symmetric/src/sponge.rs:157` (PaddingFreeSponge:
overwrite-mode, permute after each full rate block, permute a trailing
partial block only if non-empty, squeeze first OUT) and
`symmetric/src/compression.rs:17` (TruncatedPermutation: zero-extended
concat, permute, truncate).

Device variants are batched over rows: hashing h Merkle leaves is ONE
sequence of Poseidon2 calls on (h, WIDTH) lanes — the TPU replacement for
the reference's vertically-packed SIMD leaf hashing
(`merkle-tree/src/merkle_tree.rs:268-321`).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .poseidon2 import Poseidon2


@dataclass(frozen=True)
class PaddingFreeSponge:
    perm: Poseidon2
    rate: int
    out: int

    # digests are field elements (Monty u32 lanes); the MMCS converts to
    # standard form at host boundaries. Keccak digests set False.
    digest_is_field = True

    def hash_rows_device(self, mats):
        """Hash each row of the horizontal concat of `mats` -> (h, out).

        mats: list of (h, w_i) uint32 Monty device arrays. Overwrite-mode
        absorption: each rate-block of row elements overwrites the first
        lanes, then one batched array permutation (sponge.rs:157).
        """
        import jax

        h = mats[0].shape[0]
        width = self.perm.width
        flat = jnp.concatenate(
            [m.reshape(h, -1) for m in mats], axis=1
        )  # (h, total_w)
        total = flat.shape[1]
        state = jnp.zeros((h, width), jnp.uint32)
        nfull = total // self.rate
        if nfull:
            # ONE scan over rate-blocks: the absorb loop costs a single
            # traced/compiled permutation body regardless of row width
            blocks = (
                flat[:, : nfull * self.rate]
                .reshape(h, nfull, self.rate)
                .transpose(1, 0, 2)
            )

            def absorb(st, blk):
                st = jnp.concatenate([blk, st[:, self.rate :]], axis=1)
                return self.perm.permute_device(st), None

            state, _ = jax.lax.scan(absorb, state, blocks)
        rem = total - nfull * self.rate
        if rem:
            block = flat[:, nfull * self.rate :]
            state = jnp.concatenate([block, state[:, rem:]], axis=1)
            state = self.perm.permute_device(state)
        return state[:, : self.out]

    def hash_rows_np(self, mats):
        """Numpy variant of hash_rows_device (host, exact, no compiles)."""
        h = mats[0].shape[0]
        width = self.perm.width
        flat = np.concatenate([np.asarray(m).reshape(h, -1) for m in mats],
                              axis=1)
        total = flat.shape[1]
        state = np.zeros((h, width), np.uint32)
        for start in range(0, total, self.rate):
            block = flat[:, start : start + self.rate]
            k = block.shape[1]
            state = np.concatenate([block, state[:, k:]], axis=1)
            state = self.perm.permute_np(state)
        return state[:, : self.out]

    def hash_iter_host(self, elems):
        """Exact host hash of a flat iterable of standard-form ints."""
        state = [0] * self.perm.width
        pos = 0
        for x in elems:
            state[pos] = x % self.perm.F.P
            pos += 1
            if pos == self.rate:
                state = self.perm.permute_host(state)
                pos = 0
        if pos > 0:
            state = self.perm.permute_host(state)
        return tuple(state[: self.out])

    def _ops(self):
        from .poseidon2 import DeviceOps

        return DeviceOps(self.perm.F)


@dataclass(frozen=True)
class TruncatedPermutation:
    """2-to-1 digest compression (compression.rs:17 with N=2)."""

    perm: Poseidon2
    chunk: int  # digest size (8)

    def compress_device(self, left, right):
        """left/right (h, chunk) -> (h, chunk)."""
        h = left.shape[0]
        width = self.perm.width
        assert 2 * self.chunk <= width
        pad = jnp.zeros((h, width - 2 * self.chunk), jnp.uint32)
        state = jnp.concatenate([left, right, pad], axis=1)
        state = self.perm.permute_device(state)
        return state[:, : self.chunk]

    def compress_np(self, left, right):
        """Numpy variant of compress_device."""
        h = left.shape[0]
        width = self.perm.width
        pad = np.zeros((h, width - 2 * self.chunk), np.uint32)
        state = np.concatenate([left, right, pad], axis=1)
        return self.perm.permute_np(state)[:, : self.chunk]

    def compress_host(self, left, right):
        state = list(left) + list(right)
        state += [0] * (self.perm.width - len(state))
        out = self.perm.permute_host(state)
        return tuple(out[: self.chunk])

    # N-ary variants (compression.rs TruncatedPermutation<_, N, CHUNK, W>
    # general case — the arity-schedule trees of merkle/generalized.py)
    def compress_many_np(self, children):
        h = children[0].shape[0]
        width = self.perm.width
        assert len(children) * self.chunk <= width
        pad = np.zeros(
            (h, width - len(children) * self.chunk), np.uint32
        )
        state = np.concatenate(list(children) + [pad], axis=1)
        return self.perm.permute_np(state)[:, : self.chunk]

    def compress_host_many(self, children):
        state = [int(x) for c in children for x in c]
        assert len(state) <= self.perm.width
        state += [0] * (self.perm.width - len(state))
        out = self.perm.permute_host(state)
        return tuple(out[: self.chunk])
