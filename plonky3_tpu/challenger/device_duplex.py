"""Device-resident DuplexChallenger: the Poseidon2 Fiat-Shamir
transcript as TPU ops.

Exact model of `challenger/src/duplex_challenger.rs:33` (the host mirror
is challenger/duplex.py — see its docstring for the duplexing rules),
with the state/permutes as device programs so every challenge feeds the
next kernel without a device->host pull. The counterpart of
`device_serializing.py` for the reference's Poseidon2 benchmark config
(examples/src/types.rs:44-62: DuplexChallenger<F, Perm24, 24, 16>).

Unlike the keccak transcript there is no rejection sampling — a duplex
sample IS a field element — so the only validity flag is the PoW replay
check. The state lives in Monty form (the device permutation's native
representation); sampled outputs are Monty-form scalars ready for the
field kernels, and bit-samples convert to standard form on device before
masking (low bits are representation-dependent).

The pop-from-the-end output buffer and the duplex-on-demand rules are
data-INdependent, so the whole state machine unrolls at trace time:
each duplex is one batched-width-1 permutation in the jitted program.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class DeviceDuplexChallenger:
    ON_DEVICE = True

    def __init__(self, F, perm, rate: int = 16):
        self.F = F
        self.perm = perm  # hashes/poseidon2.py Poseidon2 (device path)
        self.rate = rate
        self.state = jnp.zeros((perm.width,), jnp.uint32)  # monty
        self.input_buffer = []  # monty device scalars
        self.output_buffer = []  # monty device scalars (pop from end)
        self.flags = []  # device bools; all must pull True

    # -- duplexing (duplex_challenger.rs:92-117) ------------------------
    def _duplexing(self):
        k = len(self.input_buffer)
        assert k <= self.rate
        st = self.state
        if k:
            st = st.at[:k].set(jnp.stack(self.input_buffer))
            self.input_buffer = []
            if k < self.rate:
                st = st.at[k : self.rate].set(jnp.uint32(0))
            tag = jnp.uint32(self.F.to_monty_h(k))
            st = st.at[self.rate].set(self.F.add(st[self.rate], tag))
        st = self.perm.permute_device(st[None, :])[0]
        self.state = st
        self.output_buffer = [st[i] for i in range(self.rate)]

    # -- observation ----------------------------------------------------
    def observe_words(self, words):
        """Monty-form field elements (row-major). Full rate-blocks absorb
        via ONE lax.scan (k == rate duplexes are uniform: overwrite the
        rate, add the length tag, permute) so wide observes — e.g. the
        (w, D) ys matrix — cost one scanned permutation body, not
        thousands of traced scalar ops."""
        import jax

        w = jnp.asarray(words, jnp.uint32).reshape(-1)
        n = int(w.shape[0])
        if n == 0:
            return
        self.output_buffer = []
        i = 0
        k = len(self.input_buffer)
        if k:
            take = min(n, self.rate - k)
            for j in range(take):
                self.input_buffer.append(w[j])
            i = take
            if len(self.input_buffer) == self.rate:
                self._duplexing()
                if i < n:  # more words follow: observe clears the buffer
                    self.output_buffer = []
        nblocks = (n - i) // self.rate
        if nblocks:
            blocks = w[i : i + nblocks * self.rate].reshape(
                nblocks, self.rate
            )
            tag = jnp.uint32(self.F.to_monty_h(self.rate))
            rate = self.rate

            def absorb(st, blk):
                st = st.at[:rate].set(blk)
                st = st.at[rate].set(self.F.add(st[rate], tag))
                return self.perm.permute_device(st[None, :])[0], None

            st, _ = jax.lax.scan(absorb, self.state, blocks)
            self.state = st
            self.input_buffer = []
            self.output_buffer = [st[j] for j in range(self.rate)]
            i += nblocks * self.rate
        for j in range(i, n):
            self.output_buffer = []
            self.input_buffer.append(w[j])
            if len(self.input_buffer) == self.rate:
                self._duplexing()

    def observe_host_ints(self, values_std):
        if not values_std:
            return
        v = np.asarray(values_std, dtype=np.uint64).astype(np.uint32)
        self.observe_words(jnp.asarray(self.F.to_monty_np(v)))

    # -- sampling -------------------------------------------------------
    def _pop(self):
        if self.input_buffer or not self.output_buffer:
            self._duplexing()
        return self.output_buffer.pop()

    def sample_fields_m(self, num: int):
        return jnp.stack([self._pop() for _ in range(num)])

    def sample_bits_array(self, bits: int, num: int):
        mask = jnp.uint32((1 << bits) - 1)
        return jnp.stack(
            [self.F.from_monty(self._pop()) & mask for _ in range(num)]
        )

    # -- PoW grind + query indices --------------------------------------
    def grind_and_sample_indices(self, pow_bits: int, n_idx: int,
                                 idx_bits: int, batch: int | None = None):
        """grind(pow_bits) then n_idx sample_bits(idx_bits), all device.

        The witness search duplicates the post-observe(w) duplex over a
        candidate batch (grinding_challenger.rs:33 semantics: smallest
        witness with sample_bits == 0); the found witness then replays
        through the real transcript state machine."""
        witness = self.grind_field(pow_bits, batch=batch)
        indices = self.sample_bits_array(idx_bits, n_idx)
        return witness, indices

    def grind_then_sample_fields(self, pow_bits: int, num: int):
        """grind(pow_bits) then `num` field samples (FRI commit PoW +
        beta). Returns (witness_std scalar, (num,) MONTY array)."""
        w = self.grind_field(pow_bits)
        return w, self.sample_fields_m(num)

    def grind_field(self, pow_bits: int, batch: int | None = None):
        """Find + absorb the PoW witness; returns its standard-form
        device scalar. Appends the replay check to `flags`."""
        import jax

        assert pow_bits > 0
        if batch is None:
            # size the candidate batch to the expected 2^pow_bits tries
            # (~2x over-provisioned); the smallest witness is found
            # regardless — windows are contiguous, first pass wins
            batch = 1 << min(17, pow_bits + 2)
        F = self.F
        k = len(self.input_buffer)
        assert k + 1 <= self.rate
        base = self.state
        if k:
            base = base.at[:k].set(jnp.stack(self.input_buffer))
        if k + 1 < self.rate:
            base = base.at[k + 1 : self.rate].set(jnp.uint32(0))
        tag = jnp.uint32(F.to_monty_h(k + 1))
        base = base.at[self.rate].set(F.add(base[self.rate], tag))
        mask = jnp.uint32((1 << pow_bits) - 1)
        iota = jnp.arange(batch, dtype=jnp.uint32)

        def try_batch(start):
            w_m = F.to_monty(start + iota)
            states = jnp.broadcast_to(base, (batch, self.perm.width))
            states = states.at[:, k].set(w_m)
            out = self.perm.permute_device(states)
            v = F.from_monty(out[:, self.rate - 1])
            ok = (v & mask) == 0
            i = jnp.argmax(ok)
            return start + i.astype(jnp.uint32), ok[i]

        def cond(c):
            return ~c[2]

        def body(c):
            start = c[0]
            w, found = try_batch(start)
            return (start + jnp.uint32(batch), w, found)

        _, witness, _ = jax.lax.while_loop(
            cond, body, (jnp.uint32(0), jnp.uint32(0), jnp.bool_(False))
        )

        # replay through the real state machine (observe -> sample_bits)
        self.output_buffer = []
        self.input_buffer.append(F.to_monty(witness))
        check = self.sample_bits_array(pow_bits, 1)[0]
        self.flags.append(check == 0)
        return witness
