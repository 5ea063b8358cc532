"""Goldilocks uni-stark: prover + config (verifier = stark/verifier.py).

The GL instantiation of the reference's field-generic prover
(`uni-stark/src/prover.rs:379` proves over any TwoAdicField — Goldilocks
included, TWO_ADICITY=32, `goldilocks/src/goldilocks.rs`): same 5-phase
Fiat-Shamir structure and transcript order as stark/prover.py, with the
device work running on (lo, hi) u32 limb-pair kernels. The host-side
verifier is the existing field-generic `stark.verifier.verify` — it only
touches the field through host-exact ops and `pcs.verify`, both of which
the GL adapters provide.

Challenger: DuplexChallenger over the width-8 Poseidon2-GL permutation,
rate 4 (`challenger/src/duplex_challenger.rs:33` semantics with
Goldilocks parameters).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..air.api import (
    BaseAir,
    _make_builder,
    get_log_num_quotient_chunks,
    get_symbolic_layout,
)
from ..air.builder import Sym
from ..challenger.duplex import DuplexChallenger
from ..fields import goldilocks_device as gd
from ..fields.goldilocks import Goldilocks
from ..fri.config import FriParameters
from ..merkle.extension_mmcs import ExtensionMmcs
from ..stark.config import StarkConfig
from ..stark.proof import Commitments, OpenedValues, Proof
from ..utils.bits import bitrev_permute_axis0, log2_strict
from .field import (
    GLE,
    GLF,
    depair,
    ext_base_mul,
    ext_mul,
    powers_host,
    split_host,
    sum_axis,
)
from .merkle import _GLPermShim, gl_merkle_mmcs
from .pcs import GlTwoAdicFriPcs, gl_inv_np

_P = Goldilocks.P


class GLDuplexChallenger(DuplexChallenger):
    """Duplex challenger over Poseidon2-GL w8 r4, with a device grind."""

    def __init__(self):
        super().__init__(_GLPermShim(), rate=4)

    def grind(self, bits: int, batch: int = 1 << 14) -> int:
        if bits == 0:
            return 0
        from ..fields.goldilocks_device import _PERM_JIT

        k = len(self.input_buffer)
        assert k + 1 <= self.rate
        base_state = list(self.state)
        for i, v in enumerate(self.input_buffer):
            base_state[i] = v
        for i in range(k + 1, self.rate):
            base_state[i] = 0
        base_state[self.rate] = (base_state[self.rate] + k + 1) % _P
        b64 = np.asarray(base_state, dtype=np.uint64)
        blo = jnp.asarray((b64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        bhi = jnp.asarray((b64 >> np.uint64(32)).astype(np.uint32))
        mask = np.uint64((1 << bits) - 1)

        start = 0
        while start < _P:
            n = min(batch, _P - start)
            slo = jnp.broadcast_to(blo, (n, 8))
            shi = jnp.broadcast_to(bhi, (n, 8))
            cands = np.arange(start, start + n, dtype=np.uint64)
            slo = slo.at[:, k].set(
                jnp.asarray((cands & np.uint64(0xFFFFFFFF)).astype(np.uint32))
            )
            shi = shi.at[:, k].set(
                jnp.asarray((cands >> np.uint64(32)).astype(np.uint32))
            )
            olo, ohi = _PERM_JIT((slo, shi))
            samp = np.asarray(olo[:, self.rate - 1]).astype(np.uint64) | (
                np.asarray(ohi[:, self.rate - 1]).astype(np.uint64) << np.uint64(32)
            )
            hits = np.nonzero((samp & mask) == 0)[0]
            if hits.size:
                w = int(start + hits[0])
                ok = self.check_witness(bits, w)
                assert ok
                return w
            start += n
        raise RuntimeError("no grinding witness found (unreachable)")


def goldilocks_stark_config(
    fri_params: FriParameters, cap_height: int = 0
) -> StarkConfig:
    """Poseidon2-GL merkle + duplex challenger uni-stark config."""
    mmcs = gl_merkle_mmcs(cap_height=cap_height)
    pcs = GlTwoAdicFriPcs(
        fri=fri_params, mmcs=mmcs,
        fri_mmcs=ExtensionMmcs(inner=mmcs, D=2, wire_cols=4),
    )
    return StarkConfig(
        pcs=pcs, challenger_factory=GLDuplexChallenger
    )


# ---------------------------------------------------------------------------
# quotient evaluation over GL pairs
# ---------------------------------------------------------------------------
class GLProverBackend:
    """ProverBackend analog with (lo, hi) pair values and GL2 alpha
    folding (air/builder.py ProverBackend for the algebra/citations)."""

    def __init__(self, alpha_pows_wire):
        self.alpha_pows = alpha_pows_wire  # (K, 4) wire u32
        self.idx = 0
        self.acc = None  # ext-of-pairs

    def const(self, c):
        return gd.const(int(c))

    def const_vec(self, values):
        v = np.asarray([int(x) % _P for x in values], dtype=np.uint64)
        lo = jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        hi = jnp.asarray((v >> np.uint64(32)).astype(np.uint32))
        return (lo.reshape(-1, 1), hi.reshape(-1, 1))

    def add(self, a, b):
        return gd.add(a, b)

    def sub(self, a, b):
        return gd.sub(a, b)

    def mul(self, a, b):
        return gd.mul(a, b)

    def neg(self, a):
        return gd.neg(a)

    def _ap(self, i):
        ap = self.alpha_pows[i]
        return ((ap[0], ap[1]), (ap[2], ap[3]))

    def _fold(self, term):
        if self.acc is None:
            self.acc = term
        else:
            self.acc = tuple(
                gd.add(a, t) for a, t in zip(self.acc, term)
            )

    def emit(self, c):
        ap = self._ap(self.idx)
        self.idx += 1
        self._fold(tuple(gd.mul(c, coord) for coord in ap))

    def emit_ext(self, comps):
        ap = self._ap(self.idx)
        self.idx += 1
        self._fold(ext_mul((comps[0], comps[1]), ap))

    def stack(self, vals):
        shapes = [jnp.broadcast_shapes(v[0].shape, v[1].shape)
                  for v in vals]
        shape = jnp.broadcast_shapes(*shapes)
        lo = jnp.stack([jnp.broadcast_to(v[0], shape) for v in vals])
        hi = jnp.stack([jnp.broadcast_to(v[1], shape) for v in vals])
        return (lo, hi)

    def emit_block(self, v, count):
        lo, hi = v
        lo = lo.reshape(count, lo.shape[-1])
        hi = hi.reshape(count, hi.shape[-1])
        ap = self.alpha_pows[self.idx : self.idx + count]  # (count, 4)
        self.idx += count
        term = tuple(
            sum_axis(
                gd.mul((lo, hi),
                       (ap[:, 2 * d][:, None], ap[:, 2 * d + 1][:, None])),
                axis=0,
            )
            for d in range(2)
        )
        self._fold(term)

    def finalize(self, shape):
        if self.acc is None:
            z = jnp.zeros(shape, jnp.uint32)
            return ((z, z), (z, z))
        return tuple(
            (jnp.broadcast_to(c[0], shape), jnp.broadcast_to(c[1], shape))
            for c in self.acc
        )


def gl_selectors_on_coset(trace_domain, coset):
    """Host-exact selector tables over the quotient coset, as device
    pairs (commit/domain.py selectors_on_coset_device semantics)."""
    G = Goldilocks
    n, N = trace_domain.size, coset.size
    rate_bits = coset.log_n - trace_domain.log_n
    s = coset.shift
    xs = powers_host(coset.gen, N, scale=s)
    s_pow_n = G.exp_h(s, n)
    zh_per = powers_host(
        G.two_adic_generator_h(rate_bits), 1 << rate_bits, scale=s_pow_n
    )
    zh_per = G.sub_np(zh_per, np.uint64(1))
    zh = np.tile(zh_per, n)
    inv_van = np.tile(gl_inv_np(zh_per), n)
    h_inv = G.inv_h(trace_domain.gen)
    first_den = G.sub_np(xs, np.uint64(1))
    last_den = G.sub_np(xs, np.uint64(h_inv))
    is_first = G.mul_np(zh, gl_inv_np(first_den))
    is_last = G.mul_np(zh, gl_inv_np(last_den))

    def pair(a):
        return (
            jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((a >> np.uint64(32)).astype(np.uint32)),
        )

    return dict(
        is_first_row=pair(is_first),
        is_last_row=pair(is_last),
        is_transition=pair(last_den),
        inv_vanishing=pair(inv_van),
    )


@partial(jax.jit, static_argnames=("air", "uses_next", "next_step"))
def _gl_quotient_jit(air, tl, th, sels, publics, alpha_pows,
                     uses_next, next_step):
    """One jitted program: constraint eval + alpha fold + inv-vanishing
    scale over the whole quotient domain. Returns wire (Nq, 4)."""
    local = (tl, th)
    if uses_next:
        nxt = (
            jnp.roll(tl, -next_step, axis=0),
            jnp.roll(th, -next_step, axis=0),
        )
    else:
        nxt = local
    backend = GLProverBackend(alpha_pows)

    def entry(kind, j):
        if kind == "local":
            return (local[0][:, j], local[1][:, j])
        if kind == "next":
            return (nxt[0][:, j], nxt[1][:, j])
        return sels[kind]

    builder = _make_builder(
        backend, air.width, air.num_public_values, entry,
        lambda j: (publics[0][j], publics[1][j]),
    )
    air.eval(builder)
    Nq = tl.shape[0]
    folded = backend.finalize((Nq,))
    res = ext_base_mul(sels["inv_vanishing"], folded)
    return jnp.stack(
        [res[0][0], res[0][1], res[1][0], res[1][1]], axis=-1
    )


# ---------------------------------------------------------------------------
# prove
# ---------------------------------------------------------------------------
def prove_gl(
    config: StarkConfig,
    air: BaseAir,
    trace,  # wire (n, 2w) u32 device / u64 host array accepted
    public_values,  # list[int] canonical u64
    spans=None,
) -> Proof:
    import time as _time

    _t = {"last": _time.perf_counter()}

    def _mark(name):
        if spans is not None:
            now = _time.perf_counter()
            spans[name] = spans.get(name, 0.0) + now - _t["last"]
            _t["last"] = now

    pcs = config.pcs
    if isinstance(trace, np.ndarray) and trace.dtype == np.uint64:
        trace = jnp.asarray(split_host(trace))
    n = trace.shape[0]
    log_n = log2_strict(n)

    log_num_chunks = get_log_num_quotient_chunks(air)
    num_chunks = 1 << log_num_chunks

    trace_domain = pcs.natural_domain_for_degree(n)
    trace_data = pcs.commit([(trace_domain, trace)])
    jax.block_until_ready(trace_data.layers[-1])
    _mark("commit trace")

    ch = config.initialise_challenger()
    ch.observe(log_n)
    ch.observe(log_n)
    ch.observe(0)
    ch.observe_digest(trace_data.commitment)
    ch.observe_many(public_values)

    alpha = ch.sample_ext(2)

    quotient_domain = trace_domain.create_disjoint_domain(
        1 << (log_n + log_num_chunks)
    )
    trace_on_qd = pcs.get_evaluations_on_domain(
        trace_data, 0, quotient_domain
    )
    num_constraints, _ = get_symbolic_layout(air)
    ap_host = np.empty((num_constraints, 2), dtype=np.uint64)
    cur = (1, 0)
    for i in range(num_constraints):
        ap_host[num_constraints - 1 - i] = cur  # descending powers
        cur = GLE.mul_h(cur, alpha)
    publics64 = np.asarray(
        [int(v) % _P for v in public_values], dtype=np.uint64
    )
    pl = jnp.asarray((publics64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    ph = jnp.asarray((publics64 >> np.uint64(32)).astype(np.uint32))
    sels = gl_selectors_on_coset(trace_domain, quotient_domain)
    tl, th = depair(trace_on_qd)
    uses_next = air.main_next_row_columns() != []
    q_wire = _gl_quotient_jit(
        air, tl, th, sels, (pl, ph), jnp.asarray(split_host(ap_host)),
        uses_next, quotient_domain.size // trace_domain.size,
    )
    jax.block_until_ready(q_wire)
    _mark("quotient eval")

    sub_evals = quotient_domain.split_evals(num_chunks, q_wire)
    sub_domains = quotient_domain.split_domains(num_chunks)
    quotient_data = pcs.commit(list(zip(sub_domains, sub_evals)))
    jax.block_until_ready(quotient_data.layers[-1])
    _mark("commit quotient")
    ch.observe_digest(quotient_data.commitment)

    zeta = ch.sample_ext(2)
    zeta_next = trace_domain.next_point_ext(GLE, zeta)

    trace_points = [zeta, zeta_next] if uses_next else [zeta]
    opened, fri_proof = pcs.open(
        [
            (trace_data, [trace_points]),
            (quotient_data, [[zeta]] * num_chunks),
        ],
        ch,
        spans=spans,
    )
    _mark("open (pcs + fri)")
    return Proof(
        commitments=Commitments(
            trace=trace_data.commitment,
            quotient_chunks=quotient_data.commitment,
        ),
        opened_values=OpenedValues(
            trace_local=opened[0][0][0],
            trace_next=opened[0][0][1] if uses_next else None,
            quotient_chunks=[opened[1][i][0] for i in range(num_chunks)],
        ),
        opening_proof=fri_proof,
        degree_bits=log_n,
    )
