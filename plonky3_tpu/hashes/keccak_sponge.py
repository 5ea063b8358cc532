"""Keccak-f[1600] leaf hasher + compressor for the Merkle MMCS.

The reference benchmark config (`examples/src/types.rs:19-42`):
  leaf hasher  SerializingHasher<PaddingFreeSponge<KeccakF, 25, 17, 4>>
  compressor   CompressionFunctionFromHasher<_, 2, 4>
  digests      [u64; 4]

Field rows serialize via `into_u64_stream` (`field/src/field.rs:911`):
Monty-form u32 little-endian bytes chunked into u64s — i.e. two adjacent
field columns pack into one u64 lane (lo = col 2j, hi = col 2j+1), odd
trailing column zero-padded. Digests here are (…, 8) uint32 arrays /
8-int tuples in (lo, hi) u64 word order; `digest_is_field = False` tells
the MMCS these are raw bits, not field elements.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .keccak import keccak_f1600_arrays, keccak_f1600_host

RATE = 17  # u64 lanes
OUT = 4  # u64 lanes -> 8 u32 words


@jax.jit
def _perm_device(lo, hi):
    return keccak_f1600_arrays(jnp, lo, hi)


def _rows_to_u64_lanes(xp, flat):
    """(h, W) u32 -> (lo, hi) arrays (h, ceil(W/2))."""
    h, W = flat.shape
    if W % 2:
        pad = xp.zeros((h, 1), np.uint32)
        flat = xp.concatenate([flat, pad], axis=1)
        W += 1
    lanes = flat.reshape(h, W // 2, 2)
    return lanes[..., 0], lanes[..., 1]


def _sponge_arrays(xp, perm, lo_in, hi_in):
    """Overwrite-mode rate-17 sponge over u64 lanes; returns (h, 8) u32."""
    h = lo_in.shape[0]
    n = lo_in.shape[1]
    slo = xp.zeros((h, 25), np.uint32)
    shi = xp.zeros((h, 25), np.uint32)
    for start in range(0, n, RATE):
        blo = lo_in[:, start : start + RATE]
        bhi = hi_in[:, start : start + RATE]
        k = blo.shape[1]
        slo = xp.concatenate([blo, slo[:, k:]], axis=1)
        shi = xp.concatenate([bhi, shi[:, k:]], axis=1)
        slo, shi = perm(slo, shi)
    out = xp.stack([slo[:, :OUT], shi[:, :OUT]], axis=-1)  # (h,4,2)
    return out.reshape(h, 2 * OUT)


@dataclass(frozen=True)
class KeccakFieldSponge:
    """Leaf hasher over field rows (SerializingHasher + keccak sponge)."""

    F: object  # Monty31 (for host std<->monty conversion only)

    digest_is_field = False
    perm = None  # interface parity with PaddingFreeSponge

    def hash_rows_device(self, mats):
        h = mats[0].shape[0]
        flat = jnp.concatenate([m.reshape(h, -1) for m in mats], axis=1)
        from .keccak_pallas import PALLAS_MIN_ROWS

        if h % 1024 == 0 and h >= PALLAS_MIN_ROWS and (
            jax.default_backend() != "cpu"
        ):
            from .keccak_pallas import keccak_sponge_rows_pallas

            out = keccak_sponge_rows_pallas(flat)
            if out is not None:
                return out
        lo, hi = _rows_to_u64_lanes(jnp, flat)
        n = lo.shape[1]
        nfull = n // RATE
        slo = jnp.zeros((h, 25), jnp.uint32)
        shi = jnp.zeros((h, 25), jnp.uint32)
        if nfull:
            blo = lo[:, : nfull * RATE].reshape(h, nfull, RATE)
            bhi = hi[:, : nfull * RATE].reshape(h, nfull, RATE)
            blocks = jnp.stack([blo, bhi], axis=-1).transpose(1, 0, 2, 3)

            def absorb(st, blk):
                sl, sh = st
                sl = jnp.concatenate([blk[..., 0], sl[:, RATE:]], axis=1)
                sh = jnp.concatenate([blk[..., 1], sh[:, RATE:]], axis=1)
                return _perm_device(sl, sh), None

            (slo, shi), _ = jax.lax.scan(absorb, (slo, shi), blocks)
        rem = n - nfull * RATE
        if rem:
            slo = jnp.concatenate(
                [lo[:, nfull * RATE :], slo[:, rem:]], axis=1
            )
            shi = jnp.concatenate(
                [hi[:, nfull * RATE :], shi[:, rem:]], axis=1
            )
            slo, shi = _perm_device(slo, shi)
        out = jnp.stack([slo[:, :OUT], shi[:, :OUT]], axis=-1)
        return out.reshape(h, 2 * OUT)

    def hash_rows_np(self, mats):
        h = mats[0].shape[0]
        flat = np.concatenate(
            [np.asarray(m).reshape(h, -1) for m in mats], axis=1
        )
        lo, hi = _rows_to_u64_lanes(np, flat)
        return _sponge_arrays(
            np, lambda a, b: keccak_f1600_arrays(np, a, b), lo, hi
        )

    def hash_iter_host(self, elems):
        """elems: standard-form field ints -> 8-u32 digest tuple."""
        m = [self.F.to_monty_h(int(x)) for x in elems]
        if len(m) % 2:
            m.append(0)
        lanes_in = [
            m[2 * i] | (m[2 * i + 1] << 32) for i in range(len(m) // 2)
        ]
        state = [0] * 25
        for start in range(0, len(lanes_in), RATE):
            block = lanes_in[start : start + RATE]
            state[: len(block)] = block
            state = keccak_f1600_host(state)
        out = []
        for i in range(OUT):
            out.append(state[i] & 0xFFFFFFFF)
            out.append(state[i] >> 32)
        return tuple(out)


@dataclass(frozen=True)
class KeccakCompressor:
    """2-to-1 over [u64;4] digests (CompressionFunctionFromHasher)."""

    def compress_device(self, left, right):
        h = left.shape[0]
        from .keccak_pallas import PALLAS_MIN_ROWS

        if h % 1024 == 0 and h >= PALLAS_MIN_ROWS and (
            jax.default_backend() != "cpu"
        ):
            from .keccak_pallas import keccak_compress_pallas

            out = keccak_compress_pallas(left, right)
            if out is not None:
                return out
        cat = jnp.concatenate([left, right], axis=1).reshape(h, 8, 2)
        lo, hi = cat[..., 0], cat[..., 1]
        slo = jnp.concatenate(
            [lo, jnp.zeros((h, 25 - 8), jnp.uint32)], axis=1
        )
        shi = jnp.concatenate(
            [hi, jnp.zeros((h, 25 - 8), jnp.uint32)], axis=1
        )
        slo, shi = _perm_device(slo, shi)
        out = jnp.stack([slo[:, :OUT], shi[:, :OUT]], axis=-1)
        return out.reshape(h, 2 * OUT)

    def compress_np(self, left, right):
        h = left.shape[0]
        cat = np.concatenate([left, right], axis=1).reshape(h, 8, 2)
        lo = np.concatenate(
            [cat[..., 0], np.zeros((h, 17), np.uint32)], axis=1
        )
        hi = np.concatenate(
            [cat[..., 1], np.zeros((h, 17), np.uint32)], axis=1
        )
        lo, hi = keccak_f1600_arrays(np, lo, hi)
        out = np.stack([lo[:, :OUT], hi[:, :OUT]], axis=-1)
        return out.reshape(h, 2 * OUT)

    def compress_host(self, left, right):
        """left/right: 8-u32 tuples -> 8-u32 tuple."""
        words = list(left) + list(right)
        lanes = [
            words[2 * i] | (words[2 * i + 1] << 32) for i in range(8)
        ]
        state = lanes + [0] * 17
        state = keccak_f1600_host(state)
        out = []
        for i in range(OUT):
            out.append(state[i] & 0xFFFFFFFF)
            out.append(state[i] >> 32)
        return tuple(out)

    # N-ary variants: N digests (4 u64 lanes each) absorbed in one
    # rate-17 block while N <= 4 (merkle/generalized.py arity trees)
    def compress_many_np(self, children):
        h = children[0].shape[0]
        words = np.concatenate(list(children), axis=1)  # (h, 8N) u32
        n_lanes = words.shape[1] // 2
        assert n_lanes <= RATE, "arity too large for one keccak block"
        cat = words.reshape(h, n_lanes, 2)
        lo = np.concatenate(
            [cat[..., 0], np.zeros((h, 25 - n_lanes), np.uint32)], axis=1
        )
        hi = np.concatenate(
            [cat[..., 1], np.zeros((h, 25 - n_lanes), np.uint32)], axis=1
        )
        lo, hi = keccak_f1600_arrays(np, lo, hi)
        out = np.stack([lo[:, :OUT], hi[:, :OUT]], axis=-1)
        return out.reshape(h, 2 * OUT)

    def compress_host_many(self, children):
        words = [int(x) for c in children for x in c]
        n_lanes = len(words) // 2
        assert n_lanes <= RATE
        lanes = [
            words[2 * i] | (words[2 * i + 1] << 32)
            for i in range(n_lanes)
        ]
        state = lanes + [0] * (25 - n_lanes)
        state = keccak_f1600_host(state)
        out = []
        for i in range(OUT):
            out.append(state[i] & 0xFFFFFFFF)
            out.append(state[i] >> 32)
        return tuple(out)
