"""Device-resident SerializingChallenger32: the keccak Fiat-Shamir
transcript as TPU ops.

Byte-exact model of the same wire semantics as `serializing.py`
(`challenger/src/serializing_challenger.rs:25` + `hash_challenger.rs:10`),
but observes, flushes and samples are device programs, so every challenge
(alpha, zeta, FRI betas, query indices, PoW witnesses) is produced ON
DEVICE and feeds the next kernel without a device->host pull. Through the
axon tunnel each pull costs ~29 ms of latency; the host-challenger prove
path pays six of them on its critical path — this challenger is how the
fast prover (stark/fast_prover.py) collapses them into one final batch.

State between transcript touches is exactly the host challenger's:

  digest   (8,) u32 device — the last flush digest (input_buffer prefix);
           None before the first flush
  pending  device u32 word buffers appended since (observes are always
           4-byte aligned in the u32-word configs this models)

Sampling computes a CHAIN of flush digests d1 = keccak256(input),
d_{i+1} = keccak256(d_i) up front (rejection sampling's consumption count
is data-dependent, so the chain over-provisions), then replays the exact
pop-from-the-end byte semantics over that supply with traced indexing.
The probability that the supply is too short is ~(2^-7)^(8k-n) per group;
a device-side flag records sufficiency and the fast prover re-proves on
the host path if any flag ever trips (never observed; the flag makes the
fallback sound rather than probabilistic).

Keccak-256 itself reuses the (lo, hi) u32-pair keccak-f of
`hashes/keccak.py`; inputs here are u32 word streams (all observes in the
SerializingChallenger32 configs are words: Monty-form field elements and
u64-word digests — `monty_31.rs:688`, `keccak/src/lib.rs:100`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hashes.keccak import keccak_f1600_arrays

RATE_WORDS = 34  # 136-byte keccak-256 rate as u32 words


def _grind_batch(pow_bits: int) -> int:
    """Candidate batch sized to the expected 2^pow_bits tries (~2x
    over-provisioned so the search usually ends in one while_loop
    iteration), capped at the 2^17 that saturates the chip. The found
    witness is batch-independent: windows are contiguous and the first
    passing candidate wins."""
    return 1 << min(17, pow_bits + 2)


def _keccak256_words(words):
    """keccak256 of a (n,) u32 LE word stream -> (8,) u32 LE digest words.

    Padding: 0x01 at byte 4n, 0x80 at the final byte of the last rate
    block (word-aligned input makes both single-word XORs)."""
    n = words.shape[0]
    nb = n // RATE_WORDS + 1
    buf = jnp.zeros((nb * RATE_WORDS,), jnp.uint32)
    buf = buf.at[:n].set(words)
    buf = buf.at[n].set(buf[n] ^ jnp.uint32(1))
    buf = buf.at[nb * RATE_WORDS - 1].set(
        buf[nb * RATE_WORDS - 1] ^ jnp.uint32(0x80000000)
    )
    blocks = buf.reshape(nb, RATE_WORDS)

    def absorb(state, block):
        lo, hi = state
        lo = lo.at[:17].set(lo[:17] ^ block[0::2])
        hi = hi.at[:17].set(hi[:17] ^ block[1::2])
        lo, hi = keccak_f1600_arrays(jnp, lo, hi)
        return (lo, hi), None

    z = jnp.zeros((25,), jnp.uint32)
    (lo, hi), _ = jax.lax.scan(absorb, (z, z), blocks)
    return jnp.stack([lo[:4], hi[:4]], axis=-1).reshape(8)


def _flush_chain(input_words, k: int):
    """(k, 8) digest chain: d1 = keccak256(input), d_{i+1} = keccak256(d_i)
    — the host challenger's lazy re-flushes, precomputed."""
    d1 = _keccak256_words(input_words)
    if k == 1:
        return d1[None, :]

    def step(d, _):
        nd = _keccak256_words(d)
        return nd, nd

    _, rest = jax.lax.scan(step, d1, None, length=k - 1)
    return jnp.concatenate([d1[None, :], rest], axis=0)


def _bswap32(x):
    return (
        ((x & 0xFF) << 24)
        | ((x & 0xFF00) << 8)
        | ((x >> 8) & 0xFF00)
        | (x >> 24)
    )


def _supply(digests):
    """u32 values in pop-from-the-END order: the j-th popped u32 of one
    digest is the byteswap of its (7-j)-th LE word."""
    return _bswap32(digests[:, ::-1]).reshape(-1)


@partial(jax.jit, static_argnames=("F", "k", "num"))
def _sample_fields_jit(F, input_words, k: int, num: int):
    """Flush chain + rejection-sample `num` field elements.

    Returns (vals_std (num,), state_digest (8,), ok_flag)."""
    digs = _flush_chain(input_words, k)
    sup = _supply(digs)
    bound = jnp.uint32((1 << (F.P - 1).bit_length()) - 1)
    v = sup & bound
    ok = v < jnp.uint32(F.P)
    cs = jnp.cumsum(ok.astype(jnp.int32))
    pos = jnp.stack([jnp.argmax(cs == (j + 1)) for j in range(num)])
    vals = v[pos]
    consumed = pos[num - 1] + 1
    state = digs[(consumed - 1) // 8]
    return vals, state, cs[-1] >= num


@partial(jax.jit, static_argnames=("k", "num", "bits"))
def _sample_bits_jit(input_words, k: int, num: int, bits: int):
    digs = _flush_chain(input_words, k)
    sup = _supply(digs)
    vals = sup[:num] & jnp.uint32((1 << bits) - 1)
    state = digs[(num - 1) // 8]
    return vals, state


def _grind_search(F, state_words, pow_bits: int, batch: int):
    """Smallest witness w with keccak256(state_words ++ [monty(w)])'s
    first popped u32 passing the PoW. Handles messages of ANY length:
    the witness-independent prefix blocks absorb once; per candidate
    only the block(s) from the witness word onward permute (usually one;
    two when the 0x01 pad spills into a fresh block)."""
    m = state_words.shape[0]
    total = m + 1  # message = state_words ++ [witness]
    nb = total // RATE_WORDS + 1
    buf = jnp.zeros((nb * RATE_WORDS,), jnp.uint32)
    buf = buf.at[:m].set(state_words)
    buf = buf.at[total].set(jnp.uint32(1))  # 0x01 pad word
    buf = buf.at[nb * RATE_WORDS - 1].set(
        buf[nb * RATE_WORDS - 1] ^ jnp.uint32(0x80000000)
    )
    wblock = m // RATE_WORDS  # block index holding the witness word
    wpos = m % RATE_WORDS

    def absorb_one(state, block):
        lo, hi = state
        lo = lo.at[..., :17].set(lo[..., :17] ^ block[..., 0::2])
        hi = hi.at[..., :17].set(hi[..., :17] ^ block[..., 1::2])
        return keccak_f1600_arrays(jnp, lo, hi)

    z = jnp.zeros((25,), jnp.uint32)
    prefix = (z, z)
    for b in range(wblock):
        prefix = absorb_one(prefix, buf[b * RATE_WORDS : (b + 1) * RATE_WORDS])
    tail = buf[wblock * RATE_WORDS :].reshape(-1, RATE_WORDS)

    pow_mask = jnp.uint32((1 << pow_bits) - 1)
    iota = jnp.arange(batch, dtype=jnp.uint32)

    def try_batch(start):
        w_m = F.to_monty(start + iota)
        t0 = jnp.broadcast_to(tail[0], (batch, RATE_WORDS))
        t0 = t0.at[:, wpos].set(t0[:, wpos] ^ w_m)
        state = (
            jnp.broadcast_to(prefix[0], (batch, 25)),
            jnp.broadcast_to(prefix[1], (batch, 25)),
        )
        state = absorb_one(state, t0)
        for b in range(1, tail.shape[0]):
            state = absorb_one(
                state, jnp.broadcast_to(tail[b], (batch, RATE_WORDS))
            )
        v = _bswap32(state[1][:, 3])
        ok = (v & pow_mask) == 0
        i = jnp.argmax(ok)
        return start + i.astype(jnp.uint32), ok[i]

    def cond(c):
        return ~c[2]

    def body(c):
        start = c[0]
        w, found = try_batch(start)
        return (start + jnp.uint32(batch), w, found)

    _, witness, _found = jax.lax.while_loop(
        cond, body, (jnp.uint32(0), jnp.uint32(0), jnp.bool_(False))
    )
    return witness


@partial(
    jax.jit,
    static_argnames=("F", "pow_bits", "num", "k", "batch"),
)
def _grind_fields_jit(
    F, state_words, pow_bits: int, num: int, k: int, batch: int = 1 << 17,
):
    """Device PoW grind + `num` rejection-sampled field elements in one
    program — the per-FRI-round `grind(commit_pow); sample beta` pair
    (`fri/src/prover.rs:192` round structure).

    Returns (witness_std, vals_std (num,), state_digest, ok)."""
    pow_mask = jnp.uint32((1 << pow_bits) - 1)
    witness = _grind_search(F, state_words, pow_bits, batch)

    input2 = jnp.concatenate([state_words, F.to_monty(witness)[None]])
    digs = _flush_chain(input2, k)
    sup = _supply(digs)
    pow_ok = (sup[0] & pow_mask) == 0
    bound = jnp.uint32((1 << (F.P - 1).bit_length()) - 1)
    v = sup[1:] & bound
    ok = v < jnp.uint32(F.P)
    cs = jnp.cumsum(ok.astype(jnp.int32))
    pos = jnp.stack([jnp.argmax(cs == (j + 1)) for j in range(num)])
    vals = v[pos]
    consumed = 1 + pos[num - 1] + 1
    state = digs[(consumed - 1) // 8]
    return witness, vals, state, pow_ok & (cs[-1] >= num)


@partial(
    jax.jit,
    static_argnames=("F", "pow_bits", "n_idx", "idx_bits", "batch"),
)
def _grind_indices_jit(
    F, state_words, pow_bits: int, n_idx: int, idx_bits: int,
    batch: int = 1 << 17,
):
    """Device PoW grind + query index sampling in one program.

    Finds the smallest canonical witness w with
    sample_bits(pow_bits) == 0 after observe(w), then continues popping
    `n_idx` u32s masked to idx_bits — exactly the host challenger's
    grind -> sample_bits sequence (`grinding_challenger.rs`).

    Returns (witness_std, indices (n_idx,) u32, state_digest, pow_ok)."""
    pow_mask = jnp.uint32((1 << pow_bits) - 1)
    witness = _grind_search(F, state_words, pow_bits, batch)

    input2 = jnp.concatenate(
        [state_words, F.to_monty(witness)[None]]
    )
    k = (1 + n_idx + 7) // 8
    digs = _flush_chain(input2, k)
    sup = _supply(digs)
    pow_ok = (sup[0] & pow_mask) == 0
    indices = sup[1 : 1 + n_idx] & jnp.uint32((1 << idx_bits) - 1)
    state = digs[(1 + n_idx - 1) // 8]
    return witness, indices, state, pow_ok


class DeviceSerializingChallenger32:
    """Drop-in device transcript for the u32-word keccak configs.

    Samples return MONTY-form device arrays (ready for the field
    kernels); `flags` collects device booleans that must all pull True
    for the transcript to be valid (supply sufficiency + PoW checks)."""

    ON_DEVICE = True

    def __init__(self, F):
        self.F = F
        self.digest = None  # (8,) u32 device, last flush digest
        self.pending = []  # device/np u32 word buffers since last flush
        self.flags = []  # device bool scalars; all must be True

    # -- observation ----------------------------------------------------
    def observe_words(self, words):
        """Raw wire words: Monty-form field elements or digest words."""
        w = jnp.asarray(words, jnp.uint32).reshape(-1)
        if w.size:
            self.pending.append(w)

    def observe_host_ints(self, values_std):
        """Standard-form host ints (observed in Monty form, like the host
        challenger's observe)."""
        if not values_std:
            return
        v = np.asarray(values_std, dtype=np.uint64).astype(np.uint32)
        self.pending.append(jnp.asarray(self.F.to_monty_np(v)))

    # -- sampling -------------------------------------------------------
    def _input_words(self):
        parts = ([self.digest] if self.digest is not None else [])
        parts += self.pending
        assert parts, "transcript must observe before sampling"
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    def sample_fields_m(self, num: int):
        """`num` rejection-sampled field elements as a (num,) MONTY
        device array (e.g. one extension element for num == E.D)."""
        inp = self._input_words()
        k = (num + 4 + 7) // 8 + 1  # rejection slack: >=12 spare u32s
        vals, state, ok = _sample_fields_jit(self.F, inp, k, num)
        self.digest, self.pending = state, []
        self.flags.append(ok)
        return self.F.to_monty(vals)

    def sample_bits_array(self, bits: int, num: int):
        """`num` masked u32s (query-index sampling), (num,) device."""
        inp = self._input_words()
        k = (num + 7) // 8
        vals, state = _sample_bits_jit(inp, k, num, bits)
        self.digest, self.pending = state, []
        return vals

    def grind_then_sample_fields(self, pow_bits: int, num: int):
        """grind(pow_bits) then `num` field samples (the FRI commit-PoW +
        beta pair). Returns (witness_std scalar, (num,) MONTY array)."""
        assert pow_bits > 0
        inp = self._input_words()
        k = (1 + num + 4 + 7) // 8 + 1
        witness, vals, state, ok = _grind_fields_jit(
            self.F, inp, pow_bits, num, k, batch=_grind_batch(pow_bits)
        )
        self.digest, self.pending = state, []
        self.flags.append(ok)
        return witness, self.F.to_monty(vals)

    def grind_and_sample_indices(self, pow_bits: int, n_idx: int,
                                 idx_bits: int):
        """grind(pow_bits) then `n_idx` sample_bits(idx_bits), fused.

        Returns (witness_std scalar, indices (n_idx,)) device arrays."""
        assert pow_bits > 0
        inp = self._input_words()
        witness, indices, state, pow_ok = _grind_indices_jit(
            self.F, inp, pow_bits, n_idx, idx_bits,
            batch=_grind_batch(pow_bits),
        )
        self.digest, self.pending = state, []
        self.flags.append(pow_ok)
        return witness, indices
