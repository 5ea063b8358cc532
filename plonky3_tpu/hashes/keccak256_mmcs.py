"""Keccak-256 byte-digest Merkle hashers (the reference's circle-fixture
config: `SerializingHasher<Keccak256Hash>` leaf hasher +
`CompressionFunctionFromHasher<Keccak256Hash, 2, 32>` compressor,
`uni-stark/tests/fib_air.rs:203-209`).

Digests are 32 raw bytes (stored as 32-wide uint32/uint8 arrays; tuples of
32 ints on the host). Field rows serialize as canonical-form u32
little-endian byte streams (Mersenne31 serde, `mersenne_31.rs:180-185`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .keccak import keccak256


def _rows_to_bytes(flat: np.ndarray) -> np.ndarray:
    """(h, W) u32 wire-form -> (h, 4W) uint8 little-endian."""
    h, W = flat.shape
    out = np.empty((h, 4 * W), dtype=np.uint8)
    v = flat.astype(np.uint32)
    out[:, 0::4] = (v & 0xFF).astype(np.uint8)
    out[:, 1::4] = ((v >> 8) & 0xFF).astype(np.uint8)
    out[:, 2::4] = ((v >> 16) & 0xFF).astype(np.uint8)
    out[:, 3::4] = ((v >> 24) & 0xFF).astype(np.uint8)
    return out


@dataclass(frozen=True)
class Keccak256FieldHasher:
    """Leaf hasher: keccak256 of each row's serialized bytes."""

    F: object  # field (for interface parity; M31 wire form == canonical)

    digest_is_field = False
    host_only = True  # byte-keccak runs on host (conformance config)
    perm = None

    def hash_rows_np(self, mats):
        h = mats[0].shape[0]
        flat = np.concatenate(
            [np.asarray(m).reshape(h, -1) for m in mats], axis=1
        )
        rows = _rows_to_bytes(flat)
        from ..native import keccak256_rows

        digs = keccak256_rows(rows)
        if digs is not None:
            return digs.astype(np.uint32)
        out = np.empty((h, 32), dtype=np.uint32)
        for i in range(h):
            out[i] = np.frombuffer(keccak256(rows[i].tobytes()), np.uint8)
        return out

    def hash_rows_device(self, mats):
        # host fallback: the byte-keccak config is a conformance target,
        # not the benchmark path (that one is the u64-lane KeccakF sponge)
        import jax.numpy as jnp

        return jnp.asarray(self.hash_rows_np([np.asarray(m) for m in mats]))

    def hash_iter_host(self, elems):
        data = b"".join(
            int(x).to_bytes(4, "little") for x in elems
        )
        return tuple(keccak256(data))


@dataclass(frozen=True)
class Keccak256Compressor:
    """compress(l, r) = keccak256(l_bytes || r_bytes) truncated to 32."""

    perm = None

    def compress_np(self, left, right):
        left = np.asarray(left, dtype=np.uint8)
        right = np.asarray(right, dtype=np.uint8)
        h = left.shape[0]
        from ..native import keccak256_rows

        digs = keccak256_rows(np.concatenate([left, right], axis=1))
        if digs is not None:
            return digs.astype(np.uint32)
        out = np.empty((h, 32), dtype=np.uint32)
        for i in range(h):
            out[i] = np.frombuffer(
                keccak256(left[i].tobytes() + right[i].tobytes()), np.uint8
            )
        return out

    def compress_device(self, left, right):
        import jax.numpy as jnp

        return jnp.asarray(
            self.compress_np(np.asarray(left), np.asarray(right))
        )

    def compress_host(self, left, right):
        data = bytes(int(x) & 0xFF for x in left) + bytes(
            int(x) & 0xFF for x in right
        )
        return tuple(keccak256(data))
