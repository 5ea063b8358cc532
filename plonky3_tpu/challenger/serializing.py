"""SerializingChallenger32 over HashChallenger<u8, Keccak256, 32>.

Byte-exact model of `challenger/src/serializing_challenger.rs:25` +
`hash_challenger.rs:10`:

  observe(F):   push LE bytes of the MONTY form (to_unique_u32,
                monty_31.rs:688 — "fine to hash things in monty form")
  observe u64 digests: LE bytes of each u64 word
  flush():      digest = keccak256(input_buffer); input_buffer = digest
                (chaining); output_buffer = digest
  sample u8:    pop from the END of output_buffer
  sample F:     4 popped bytes as LE u32, mask to 2^ceil(log2 P)-1,
                rejection-sample until < P
  sample_bits:  4 popped bytes as LE u32 & (2^bits - 1)
  grind(bits):  smallest F witness w with sample_bits(bits)==0 after
                observe(w) — searched with the vectorized numpy keccak
                batch kernel, then replayed on the transcript.
"""

from __future__ import annotations

import numpy as np

from ..hashes.keccak import keccak256, keccak256_np_batch


class SerializingChallenger32:
    def __init__(self, F, digest_bytes: bool = False):
        self.F = F
        # digest_bytes: commitments are [u8; 32] keccak digests (the circle
        # fixture config) observed one raw byte each, vs u64-word digests
        # observed as 4-byte LE u32 lanes (the KeccakF benchmark config).
        self.digest_bytes = digest_bytes
        self.input_buffer = bytearray()
        self.output_buffer = []  # list of ints (bytes); pop from end

    # -- observation ----------------------------------------------------
    def observe(self, value: int):
        """Observe a field element (standard form int)."""
        m = self.F.to_monty_h(int(value) % self.F.P)
        self.output_buffer.clear()
        self.input_buffer += m.to_bytes(4, "little")

    def observe_many(self, values):
        for v in values:
            self.observe(int(v))

    def observe_ext(self, ext_tuple):
        for c in ext_tuple:
            self.observe(int(c))

    def observe_base_array(self, values_std: np.ndarray):
        """Observe a whole array of standard-form field elements in one
        vectorized append (row-major order == element-by-element observe;
        the per-call Python overhead dominated the ys-observe phase)."""
        v = np.ascontiguousarray(values_std).reshape(-1)
        if v.size == 0:
            return
        m = self.F.to_monty_np(v.astype(np.uint64).astype(np.uint32))
        self.output_buffer.clear()
        self.input_buffer += m.astype("<u4").tobytes()

    def observe_digest(self, values):
        """Keccak Merkle roots: [u8;32] raw bytes, or 8 u32 words (= 4
        u64s) as LE bytes, per the config's digest type. A Merkle cap
        (nested sequence of digests) observes each digest in order —
        equivalent to the flattened byte stream."""
        if values and isinstance(values[0], (tuple, list, bytes)):
            for d in values:
                self.observe_digest(d)
            return
        self.output_buffer.clear()
        if self.digest_bytes:
            self.input_buffer += bytes(int(v) & 0xFF for v in values)
        else:
            for v in values:
                self.input_buffer += (int(v) & 0xFFFFFFFF).to_bytes(
                    4, "little"
                )

    # -- sampling ---------------------------------------------------------
    def _flush(self):
        digest = keccak256(bytes(self.input_buffer))
        self.input_buffer = bytearray(digest)
        self.output_buffer = list(digest)

    def _sample_byte(self) -> int:
        if not self.output_buffer:
            self._flush()
        return self.output_buffer.pop()

    def _sample_u32(self) -> int:
        b = [self._sample_byte() for _ in range(4)]
        return b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)

    def sample(self) -> int:
        bound = (1 << (self.F.P - 1).bit_length()) - 1
        while True:
            v = self._sample_u32() & bound
            if v < self.F.P:
                return v

    def sample_ext(self, D: int) -> tuple:
        return tuple(self.sample() for _ in range(D))

    def sample_bits(self, bits: int) -> int:
        assert (1 << bits) < self.F.P
        return self._sample_u32() & ((1 << bits) - 1)

    def sample_uniform_bits(self, bits: int) -> int:
        """Unbiased bit sampling with field-side rejection (see
        duplex.py:_sample_uniform_bits; the serializing challenger's
        sample() already rejection-samples to a uniform field element)."""
        from .duplex import _sample_uniform_bits

        return _sample_uniform_bits(self, self.F, bits)

    # -- proof of work ----------------------------------------------------
    def check_witness(self, bits: int, witness: int) -> bool:
        if bits == 0:
            return True  # mirror grind(0): no transcript interaction
        self.observe(witness)
        return self.sample_bits(bits) == 0

    def grind(self, bits: int, batch: int = 1 << 17) -> int:
        if bits == 0:
            # grind(0) still observes witness 0 and samples
            # (grinding_challenger.rs returns ZERO without transcript
            # interaction — mirror that)
            return 0
        prefix = bytes(self.input_buffer)
        mask = (1 << bits) - 1
        # native C path: ~1M hashes/s on host, no device round-trip
        from ..native import keccak256_grind

        start = 0
        probe = keccak256_grind(prefix, np.zeros(1, np.uint32), mask)
        if probe is not None:
            while start < self.F.P:
                n = min(batch, self.F.P - start)
                cands = np.arange(start, start + n, dtype=np.uint32)
                i = keccak256_grind(
                    prefix, self.F.to_monty_np(cands), mask
                )
                if i >= 0:
                    w = int(start + i)
                    ok = self.check_witness(bits, w)
                    assert ok
                    return w
                start += n
            raise RuntimeError("no grind witness found")
        # device path: one keccak-f dispatch per batch (candidates in
        # canonical order, inserted in WIRE form)
        if len(prefix) + 4 <= 135:
            from ..hashes.keccak import keccak256_grind_device

            start = 0
            while start < self.F.P:
                n = min(batch, self.F.P - start)
                cands = np.arange(start, start + n, dtype=np.uint32)
                i = keccak256_grind_device(
                    prefix, bits, self.F.to_monty_np(cands)
                )
                if i is not None:
                    w = int(start + i)
                    ok = self.check_witness(bits, w)
                    assert ok
                    return w
                start += n
        start = 0
        while start < self.F.P:
            n = min(batch, self.F.P - start)
            cands = np.arange(start, start + n, dtype=np.uint32)
            cands_m = self.F.to_monty_np(cands)  # wire form (identity for M31)
            digests = keccak256_np_batch(prefix, cands_m)
            # sample_bits value: bytes popped from the END of the digest
            v = (
                digests[:, 31].astype(np.uint32)
                | (digests[:, 30].astype(np.uint32) << 8)
                | (digests[:, 29].astype(np.uint32) << 16)
                | (digests[:, 28].astype(np.uint32) << 24)
            )
            hits = np.nonzero((v & np.uint32(mask)) == 0)[0]
            if hits.size:
                w = int(start + hits[0])
                ok = self.check_witness(bits, w)
                assert ok
                return w
            start += n
        raise RuntimeError("no grind witness found")
