"""Poseidon2 over the BN254 scalar field, width 3 (host exact).

Mirrors `bn254/src/poseidon2.rs`: S-box x^5, 4+4 full rounds, 56 partial
rounds; width-3 external linear layer x_i += sum (the circulant 1+J,
`poseidon2/src/external.rs:128-133`), internal layer
1 + Diag([1, 1, 2]) (`bn254/src/poseidon2.rs:80-89`).

Round constants are generated from `SmallRng::seed_from_u64(1)` with the
reference's rejection sampler (`bn254/src/bn254.rs:534-550`: 32 random
LE bytes, top two bits cleared, accepted iff < P — the accepted bytes
ARE the Monty form; we store the canonical value) in new_from_rng_128
draw order (external-initial, external-terminal, internal) — the same
construction the reference's own benches use, since the upstream zkhash
constant tables are not vendored there either.

This runs on the host: it is the Groth16-wrapper digest config
(transcript/digest-sized work), not a trace-sized kernel.
"""

from __future__ import annotations

from ..compat.smallrng import SmallRng
from ..fields.bn254 import BN254 as Bn254

P = Bn254.P
HALF_FULL_ROUNDS = 4
PARTIAL_ROUNDS = 56
WIDTH = 3
# Monty R for the reference's 4x64-limb Monty representation
_R_BN254 = (1 << 256) % P


def _rng_bytes32(rng: SmallRng) -> bytes:
    out = b""
    for _ in range(4):
        out += rng.next_u64().to_bytes(8, "little")
    return out


def _sample_bn254(rng: SmallRng) -> int:
    """bn254.rs:534 rejection sampler; returns the CANONICAL value of
    the accepted Monty-form bytes."""
    while True:
        b = bytearray(_rng_bytes32(rng))
        b[31] &= (1 << 6) - 1
        monty = int.from_bytes(bytes(b), "little")
        if monty < P:
            # from_bytes_monty: the bytes are the Monty form; canonical
            # value = monty · R^{-1} mod P
            return (monty * pow(_R_BN254, P - 2, P)) % P


def _constants(seed: int = 1):
    rng = SmallRng.seed_from_u64(seed)
    initial = [
        [_sample_bn254(rng) for _ in range(WIDTH)]
        for _ in range(HALF_FULL_ROUNDS)
    ]
    terminal = [
        [_sample_bn254(rng) for _ in range(WIDTH)]
        for _ in range(HALF_FULL_ROUNDS)
    ]
    internal = [_sample_bn254(rng) for _ in range(PARTIAL_ROUNDS)]
    return initial, terminal, internal


_CONSTS = None


def _consts():
    global _CONSTS
    if _CONSTS is None:
        _CONSTS = _constants()
    return _CONSTS


def _sbox(x: int) -> int:
    x2 = (x * x) % P
    x4 = (x2 * x2) % P
    return (x4 * x) % P


def _external_linear(s):
    total = sum(s) % P
    return [(x + total) % P for x in s]


def _internal_linear(s):
    total = sum(s) % P
    return [
        (s[0] + total) % P,
        (s[1] + total) % P,
        (2 * s[2] + total) % P,
    ]


def poseidon2_bn254_permute(state):
    """[3] canonical ints -> [3] canonical ints."""
    initial, terminal, internal = _consts()
    s = [x % P for x in state]
    s = _external_linear(s)
    for rc in initial:
        s = [_sbox((x + c) % P) for x, c in zip(s, rc)]
        s = _external_linear(s)
    for c in internal:
        s[0] = _sbox((s[0] + c) % P)
        s = _internal_linear(s)
    for rc in terminal:
        s = [_sbox((x + c) % P) for x, c in zip(s, rc)]
        s = _external_linear(s)
    return s
