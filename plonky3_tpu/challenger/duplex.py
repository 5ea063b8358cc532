"""Duplex-sponge Fiat-Shamir challenger (host side) + device grinding.

Exact behavioral mirror of the reference `DuplexChallenger`
(`challenger/src/duplex_challenger.rs:33`):
  * observe: clear output buffer, push input; duplex when RATE inputs queue.
  * duplexing (:92-117): overwrite state[0..k] with the k buffered inputs;
    if k > 0 zero the remaining rate slots and add the length tag k to
    state[RATE] (prefix-free absorb); permute; output buffer = state[..RATE]
    popped from the END (state[RATE-1] first).
  * sample (:253-263): duplex if inputs pending or outputs empty; pop.
  * sample_bits (:278-284): low `bits` bits of the canonical value.
  * grind (grinding_challenger.rs:33,109): smallest field witness w such
    that observe(w); sample_bits(bits) == 0 — searched in parallel batches.

The challenger runs on the host with exact ints (it is O(proof size), not
O(trace)); grinding is the one hot part and brute-forces candidate batches
on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..hashes.poseidon2 import Poseidon2


def _sample_uniform_bits(challenger, F, bits: int) -> int:
    """Shared unbiased bit sampler (duplex_challenger.rs:378): draw field
    elements, rejecting any >= m_k = (P >> k) << k (so the kept range
    holds each k-bit pattern equally often), and return the low k bits.
    For k above the field's two-adicity (where rejection stops being
    ~1/P-rare), combine two half-width draws instead."""
    if bits == 0:
        return 0
    P = F.P
    assert (1 << bits) < P, "bit count exceeds field order"
    max_single = getattr(F, "TWO_ADICITY", 24)

    def draw(k: int) -> int:
        m = (P >> k) << k
        v = challenger.sample()
        while v >= m:
            v = challenger.sample()
        return v & ((1 << k) - 1)

    if bits <= max_single:
        return draw(bits)
    half1 = bits // 2
    half2 = bits - half1
    return draw(half1) | (draw(half2) << half1)


class DuplexChallenger:
    def __init__(self, perm: Poseidon2, rate: int = 16):
        assert 0 < rate < perm.width
        self.perm = perm
        self.rate = rate
        self.state = [0] * perm.width
        self.input_buffer: list[int] = []
        self.output_buffer: list[int] = []

    # ------------------------------------------------------------------
    def _duplexing(self):
        k = len(self.input_buffer)
        assert k <= self.rate
        for i, v in enumerate(self.input_buffer):
            self.state[i] = v
        self.input_buffer.clear()
        if k > 0:
            for i in range(k, self.rate):
                self.state[i] = 0
            self.state[self.rate] = (self.state[self.rate] + k) % self.perm.F.P
        self.state = self.perm.permute_host(self.state)
        self.output_buffer = list(self.state[: self.rate])

    def observe(self, value: int):
        self.output_buffer.clear()
        self.input_buffer.append(value % self.perm.F.P)
        if len(self.input_buffer) == self.rate:
            self._duplexing()

    def observe_many(self, values):
        for v in values:
            self.observe(int(v))

    def observe_digest(self, values):
        """Commitment roots are field digests for the duplex challenger —
        same as observe_many. A Merkle cap (nested tuple of digests,
        duplex_challenger.rs:221 CanObserve<MerkleCap>) observes each
        digest in order. (SerializingChallenger32 overrides with raw
        little-endian byte observation of u64 digest words.)"""
        if values and isinstance(values[0], (tuple, list)):
            for d in values:
                self.observe_many(d)
        else:
            self.observe_many(values)

    def observe_ext(self, ext_tuple):
        for c in ext_tuple:
            self.observe(int(c))

    def observe_base_array(self, values_std: np.ndarray):
        """Observe an array of standard-form elements (row-major order,
        identical transcript to element-by-element observe).

        Full rate-blocks absorb through the native C chain when
        available (native/poseidon2.c; the ~690-permutation ys absorb
        of the benchmark proof drops from ~1.4 s of exact-int Python to
        ~1 ms); head/tail partial blocks go element-by-element."""
        F = self.perm.F
        v = np.ascontiguousarray(values_std).reshape(-1)
        n = int(v.size)
        if n == 0:
            return
        v = (v.astype(np.uint64) % F.P).astype(np.uint32)
        nc = (
            self.perm._native_consts()
            if hasattr(self.perm, "_native_consts") else None
        )
        i = 0
        if nc is not None and n - (
            (self.rate - len(self.input_buffer)) % self.rate
        ) >= self.rate:
            from ..native import poseidon2_duplex_chain

            k = len(self.input_buffer)
            if k:
                take = min(n, self.rate - k)
                for j in range(take):
                    self.observe(int(v[j]))
                i = take
            nblocks = (n - i) // self.rate
            if nblocks:
                st = poseidon2_duplex_chain(
                    np.asarray(self.state, dtype=np.uint32),
                    v[i:i + nblocks * self.rate].reshape(
                        nblocks, self.rate
                    ),
                    nc["P"], nc["width"], self.rate, nc["d"],
                    nc["rc_ei"], nc["rc_int"], nc["rc_ef"], nc["diag"],
                )
                if st is not None:
                    self.state = [int(x) for x in st]
                    self.input_buffer = []
                    self.output_buffer = list(self.state[: self.rate])
                    i += nblocks * self.rate
        for x in v[i:].tolist():
            self.observe(x)

    def sample(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplexing()
        return self.output_buffer.pop()

    def sample_ext(self, D: int) -> tuple:
        return tuple(self.sample() for _ in range(D))

    def sample_bits(self, bits: int) -> int:
        assert (1 << bits) < self.perm.F.P
        return self.sample() & ((1 << bits) - 1)

    def sample_uniform_bits(self, bits: int) -> int:
        """Unbiased bit sampling with field-side rejection
        (duplex_challenger.rs:378 sample_uniform_bits::<true>):
        resample while the drawn element is >= m_k = (P >> k) << k, then
        take the low k bits. Above the field's single-sample limit (its
        two-adicity), two half-width draws are combined."""
        return _sample_uniform_bits(self, self.perm.F, bits)

    # ------------------------------------------------------------------
    def check_witness(self, bits: int, witness: int) -> bool:
        if bits == 0:
            return True
        self.observe(witness)
        return self.sample_bits(bits) == 0

    def grind(self, bits: int, batch: int = 1 << 14) -> int:
        """Find the smallest witness passing the PoW, via device batches.

        Mirrors GrindingChallenger::grind (candidates tried in increasing
        order so the found witness is deterministic).
        """
        if bits == 0:
            return 0
        F = self.perm.F
        # Snapshot: observing w appends it to the input buffer, then
        # sample_bits triggers duplexing with k = len(buffer)+1 inputs.
        k = len(self.input_buffer)
        assert k + 1 <= self.rate
        base_state = list(self.state)
        for i, v in enumerate(self.input_buffer):
            base_state[i] = v
        for i in range(k + 1, self.rate):
            base_state[i] = 0
        base_state[self.rate] = (base_state[self.rate] + k + 1) % F.P
        base_m = F.to_monty_np(np.array(base_state, dtype=np.uint64))
        mask = np.uint32((1 << bits) - 1)

        start = 0
        while start < F.P:
            n = min(batch, F.P - start)
            states = jnp.broadcast_to(
                jnp.asarray(base_m), (n, self.perm.width)
            )
            cands = np.arange(start, start + n, dtype=np.uint64)
            cand_m = jnp.asarray(F.to_monty_np(cands))
            states = states.at[:, k].set(cand_m)
            out = self.perm.permute_device(states)
            # sampled element = state[rate-1] (output popped from the end)
            samp = F.from_monty_np(np.asarray(out[:, self.rate - 1]))
            hits = np.nonzero((samp & mask) == 0)[0]
            if hits.size:
                w = int(start + hits[0])
                ok = self.check_witness(bits, w)  # also advances transcript
                assert ok
                return w
            start += n
        raise RuntimeError("no grinding witness found (unreachable)")
