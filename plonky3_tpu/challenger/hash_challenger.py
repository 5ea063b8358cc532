"""Generic HashChallenger (challenger/src/hash_challenger.rs): a
Fiat-Shamir challenger over ANY cryptographic hasher of field elements.

  observe:  clear output; buffer the value.
  flush:    digest = H(input_buffer); input_buffer = digest (chaining);
            output_buffer = digest.
  sample:   flush if empty; pop from the END.

Works with any object exposing `hash_iter_host(elems) -> tuple` (the
Poseidon2 PaddingFreeSponge, the keccak sponges, RPO, the BN254
MultiField sponge, ...). SerializingChallenger32 is the byte-level
specialization of this pattern; this is the field-level generic."""

from __future__ import annotations


class HashChallenger:
    def __init__(self, hasher, F, initial_state=()):
        self.hasher = hasher
        self.F = F
        self.input_buffer = list(initial_state)
        self.output_buffer = []

    def _flush(self):
        digest = list(self.hasher.hash_iter_host(self.input_buffer))
        self.input_buffer = list(digest)
        self.output_buffer = list(digest)

    def observe(self, value: int):
        self.output_buffer.clear()
        self.input_buffer.append(int(value) % self.F.P)

    def observe_many(self, values):
        for v in values:
            self.observe(int(v))

    def observe_ext(self, ext_tuple):
        for c in ext_tuple:
            self.observe(int(c))

    def observe_digest(self, values):
        if values and isinstance(values[0], (tuple, list, bytes)):
            for d in values:  # Merkle cap: observe each digest in order
                self.observe_many(d)
        else:
            self.observe_many(values)

    def sample(self) -> int:
        if not self.output_buffer:
            self._flush()
        return self.output_buffer.pop()

    def sample_ext(self, D: int) -> tuple:
        return tuple(self.sample() for _ in range(D))

    def sample_bits(self, bits: int) -> int:
        assert (1 << bits) < self.F.P
        return self.sample() & ((1 << bits) - 1)

    def sample_uniform_bits(self, bits: int) -> int:
        from .duplex import _sample_uniform_bits

        return _sample_uniform_bits(self, self.F, bits)

    def check_witness(self, bits: int, witness: int) -> bool:
        if bits == 0:
            return True
        self.observe(witness)
        return self.sample_bits(bits) == 0

    def grind(self, bits: int) -> int:
        if bits == 0:
            return 0
        import copy

        for w in range(self.F.P):
            trial = copy.deepcopy(self)
            if trial.check_witness(bits, w):
                assert self.check_witness(bits, w)
                return w
        raise RuntimeError("no grind witness found")
