"""Goldilocks Merkle commitments: Poseidon2-GL sponge over limb pairs.

Plugs into the generic MerkleTreeMmcs ladder (merkle/mmcs.py): committed
matrices are wire-form interleaved-limb u32 arrays (gl/field.py), the
sponge de-interleaves once and runs the batched device Poseidon2-GL
width-8 permutation (fields/goldilocks_device.py; x^7 S-box, 4+4 full +
22 partial rounds — goldilocks/src/poseidon2.rs). Digests are 4 GL
elements = 8 wire u32 lanes; host verification hashes with the exact-int
permutation (hashes/poseidon2_goldilocks.py).

Config mirrors the reference's Poseidon2 Merkle shape scaled to width 8
(PaddingFreeSponge rate 4 out 4, TruncatedPermutation chunk 4 — the
Goldilocks analog of examples/src/types.rs:44-62).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..fields.goldilocks_device import poseidon2_goldilocks_device
from ..hashes.poseidon2_goldilocks import poseidon2_goldilocks_permute
from ..merkle.mmcs import MerkleTreeMmcs
from .field import GLF, depair, join_host, repair

RATE = 4
OUT = 4
WIDTH = 8


class _GLPermShim:
    """Duck-typed `perm` for host challenger use (width/F/permute_host)."""

    width = WIDTH

    @property
    def F(self):
        return GLF

    def permute_host(self, state):
        return poseidon2_goldilocks_permute(state)


@dataclass(frozen=True)
class GLPoseidonSponge:
    """PaddingFreeSponge (symmetric/src/sponge.rs:157 semantics) over the
    width-8 GL permutation; operates on wire-form matrices."""

    digest_is_field = True
    perm = None  # MerkleTreeMmcs.F falls through to .F below
    F = GLF

    def hash_rows_device(self, mats):
        import jax

        h = mats[0].shape[0]
        flat = jnp.concatenate([m.reshape(h, -1) for m in mats], axis=1)
        lo, hi = depair(flat)  # (h, w) GL lanes
        total = lo.shape[1]
        slo = jnp.zeros((h, WIDTH), jnp.uint32)
        shi = jnp.zeros((h, WIDTH), jnp.uint32)
        nfull = total // RATE
        if nfull:
            # ONE scanned permutation body over full rate-blocks
            bl = lo[:, : nfull * RATE].reshape(h, nfull, RATE)
            bh = hi[:, : nfull * RATE].reshape(h, nfull, RATE)
            blocks = (bl.transpose(1, 0, 2), bh.transpose(1, 0, 2))

            def absorb(st, blk):
                slo = jnp.concatenate([blk[0], st[0][:, RATE:]], axis=1)
                shi = jnp.concatenate([blk[1], st[1][:, RATE:]], axis=1)
                return poseidon2_goldilocks_device((slo, shi)), None

            (slo, shi), _ = jax.lax.scan(absorb, (slo, shi), blocks)
        rem = total - nfull * RATE
        if rem:
            bl = lo[:, nfull * RATE :]
            bh = hi[:, nfull * RATE :]
            slo = jnp.concatenate([bl, slo[:, rem:]], axis=1)
            shi = jnp.concatenate([bh, shi[:, rem:]], axis=1)
            slo, shi = poseidon2_goldilocks_device((slo, shi))
        return repair(slo[:, :OUT], shi[:, :OUT])  # (h, 8) wire u32

    def hash_rows_np(self, mats):
        """Host-exact variant: wire-form numpy in, wire-form out."""
        h = mats[0].shape[0]
        flat = np.concatenate(
            [np.asarray(m).reshape(h, -1) for m in mats], axis=1
        )
        vals = join_host(flat)  # (h, w) u64
        out = np.empty((h, OUT), dtype=np.uint64)
        for r in range(h):
            state = [0] * WIDTH
            row = vals[r]
            for start in range(0, row.shape[0], RATE):
                blk = row[start : start + RATE]
                for i, v in enumerate(blk):
                    state[i] = int(v)
                state = poseidon2_goldilocks_permute(state)
            out[r] = state[:OUT]
        from .field import split_host

        return split_host(out)

    def hash_iter_host(self, elems):
        """Exact host hash of a flat iterable of canonical u64 ints."""
        state = [0] * WIDTH
        elems = list(elems)
        for start in range(0, len(elems), RATE):
            blk = elems[start : start + RATE]
            for i, v in enumerate(blk):
                state[i] = int(v) % GLF.P
            state = poseidon2_goldilocks_permute(state)
        return tuple(state[:OUT])


@dataclass(frozen=True)
class GLCompressor:
    """2-to-1 truncated-permutation compression of 4-element digests."""

    chunk = OUT

    def compress_device(self, left, right):
        ll, lh = depair(left)
        rl, rh = depair(right)
        slo = jnp.concatenate([ll, rl], axis=1)
        shi = jnp.concatenate([lh, rh], axis=1)
        olo, ohi = poseidon2_goldilocks_device((slo, shi))
        return repair(olo[:, :OUT], ohi[:, :OUT])

    def compress_np(self, left, right):
        lv = join_host(np.asarray(left))
        rv = join_host(np.asarray(right))
        h = lv.shape[0]
        out = np.empty((h, OUT), dtype=np.uint64)
        for r in range(h):
            state = [int(x) for x in lv[r]] + [int(x) for x in rv[r]]
            out[r] = poseidon2_goldilocks_permute(state)[:OUT]
        from .field import split_host

        return split_host(out)

    def compress_host(self, a, b):
        state = [int(x) for x in a] + [int(x) for x in b]
        return tuple(poseidon2_goldilocks_permute(state)[:OUT])


@dataclass(frozen=True)
class GLMerkleTreeMmcs(MerkleTreeMmcs):
    """MerkleTreeMmcs whose wire values are u64 GL elements."""

    wire_dtype = np.uint64


def gl_merkle_mmcs(cap_height: int = 0) -> GLMerkleTreeMmcs:
    return GLMerkleTreeMmcs(
        sponge=GLPoseidonSponge(),
        compressor=GLCompressor(),
        cap_height=cap_height,
    )
