"""Two-dispatch uni-stark prover: device Fiat-Shamir with a host-
assisted alpha2, two programs, two transfers.

Functionally identical to `prover.py` (same Proof, byte-for-byte), but
the device side traces into TWO `jax.jit` programs:

  program 1: trace commit -> observe root -> alpha -> quotient
    eval/commit -> zeta -> ys (MXU coefficient dots). Pulls ONE small
    buffer (flags, the two commitments, the ys wire values, ~44 KB);
    the LDEs/Merkle layers/ys stay device-resident as a carry pytree.
  host (keccak configs): replays the transcript over the pulled wire
    values with the host C keccak challenger (<1 ms) to sample alpha2,
    and seeds program 2 with the resulting digest state. Duplex
    (Poseidon2) configs instead absorb ys + sample alpha2 on device at
    the end of program 1 and carry the sponge state — the host
    Poseidon2 is exact-int Python, ~1000x slower than the C keccak,
    and host-replaying its ~690-permutation chain measured a 2.2x
    end-to-end regression.
  program 2: reduced-opening accumulation -> every FRI round (roots
    observed, betas sampled on device) -> final poly -> device PoW
    grind + query indices -> query gathers -> ONE flat buffer the host
    unpacks into the identical pruned-multiproof Proof.

Why the split: absorbing the ~11k-word ys stream into the DEVICE
transcript is a chain of ~320 SEQUENTIAL permutations on a single
sponge state — measured 294 ms of the round-4 single-program prover's
620 ms at the benchmark shape (tools/profile_stages.py), pure latency
on work the host hash does in <1 ms. Every other transcript
interaction (alpha/zeta/betas/queries) absorbs tens of words and stays
on device. The extra pull costs ~30 ms through the axon tunnel;
round 3's version of this prover eagerly dispatched ~300 programs and
paid 5.7 s in the same latency — the design point is "as few
dispatches as the transcript's serial hash cost allows", which is two.

Programs are cached per (config, air, trace shape, #publics); static
structure discovered during tracing (FRI arity schedule, tree shapes,
output layout) is recorded in a side dict at trace time and reused for
host assembly on every later call.

The pruned Merkle proofs are reconstructed on the host from NON-pruned
per-level sibling gathers (every (index >> lvl) ^ 1 digest): the pruned
frontier is a subset of those nodes, and the frontier walk needs the
concrete index values, which only exist after the pull. The ~60 KB of
redundant digests cost ~2 ms of transfer — a pull of the indices alone
would cost 29.

Applicability: non-ZK TwoAdicFriPcs under either reference benchmark
transcript — u32-word keccak (`keccak_stark_config`,
device_serializing.py) or Poseidon2 duplex (`poseidon2_stark_config`,
device_duplex.py) — including Merkle caps (cap_height > 0, the
examples/src/proofs.rs:96 shape) and per-round FRI commit PoW.
`prove_fast` falls back to the host-transcript `prove` otherwise — and
re-proves on it in the (cryptographically negligible, device-flagged)
event a sampling supply ran short.

Reference spec: uni-stark/src/prover.rs:379, fri/src/prover.rs:43,
merkle-tree/src/pruning.rs (wire order of the pruned multiproof).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..air.api import (
    get_log_num_quotient_chunks,
    get_symbolic_layout,
)
from ..challenger.device_serializing import DeviceSerializingChallenger32
from ..fri.config import compute_log_arity_for_round
from ..fri.proof import BatchMultiOpening, CommitPhaseStep, FriProof
from ..fri.prover import _fold_step_jit
from ..fri.two_adic_pcs import (
    TwoAdicFriPcs,
    _accum_kernel,
    _eval_coeffs,
    _ext_powers_device,
    _inv_denom_kernel,
    _mred,
)
from ..merkle.mmcs import MerkleProverData, _build_layers
from ..ops.ntt import coset_lde_batch, idft, powers_device
from ..utils.bits import bitrev_permute_axis0, log2_strict
from .proof import Commitments, OpenedValues, Proof
from .prover import prove, quotient_values


class _Unsupported(Exception):
    """Config outside the fast path; caller falls back to prove()."""


def _mmcs_commit_lazy(mmcs, mats):
    """mmcs.commit without the root pull (the commitment — root digest or
    Merkle-cap layer — stays a device array; standard form is filled in
    after the final pull). `data.eff_cap` records the clamped cap height
    (merkle_tree.rs:182-198); `data.commit_dev` is the device commitment
    ((8,) root words, or the (2^cap, 8) cap layer)."""
    for m in mats:
        log2_strict(m.shape[0])
    if getattr(mmcs.sponge, "host_only", False):
        raise _Unsupported("host-only sponge")
    log_max = log2_strict(max(m.shape[0] for m in mats))
    eff_cap = mmcs._eff_cap(log_max)
    if eff_cap > 0 and min(m.shape[0] for m in mats) < (1 << eff_cap):
        raise _Unsupported("matrix shorter than the Merkle cap layer")
    layers = _build_layers(mmcs, mats)  # traced into the outer program
    data = MerkleProverData(
        matrices=list(mats), layers=layers, root_std=None,
        digest_is_field=getattr(mmcs.sponge, "digest_is_field", True),
        cap_std=None,
    )
    data.eff_cap = eff_cap
    data.commit_dev = (
        layers[-1][0] if eff_cap == 0 else layers[log_max - eff_cap]
    )
    return data


def _pcs_commit_lazy(pcs, evaluations):
    """pcs.commit with a lazy root (same LDEs, same retained coeffs)."""
    F = pcs.F
    ldes, domains, coeffs = [], [], []
    for domain, evals in evaluations:
        assert evals.shape[0] == domain.size
        shift = F.mul_h(F.GENERATOR, F.inv_h(domain.shift))
        lde, cf = coset_lde_batch(
            F, evals, pcs.fri.log_blowup, shift, with_coeffs=True
        )
        ldes.append(lde)
        coeffs.append(cf)
        domains.append(domain)
    data = _mmcs_commit_lazy(pcs.mmcs, ldes)
    data.domains = domains
    data.coeffs = coeffs
    return data


def _pruned_wire(indices, levels: int, sib_levels):
    """Pruned-multiproof sibling list (pruning.rs wire order: level 0
    first; within a level ascending node order) selected from non-pruned
    per-level gathers sib_levels[lvl] (Q, dw) at nodes (idx >> lvl) ^ 1."""
    frontier = sorted(set(indices))
    want = []
    for lvl in range(levels):
        present = set(frontier)
        for node in frontier:
            if node ^ 1 not in present:
                want.append((lvl, node ^ 1))
        frontier = sorted({n >> 1 for n in frontier})
    pm = {}
    for lvl in range(levels):
        arr = sib_levels[lvl]
        for q, idx in enumerate(indices):
            pm[(lvl, (idx >> lvl) ^ 1)] = tuple(int(x) for x in arr[q])
    return [pm[k] for k in want]


def _tree_gathers(data, tree_idx):
    """Device gathers opening a tree at device indices: every matrix row
    (index >> height shift) + every level's sibling digest (proof paths
    stop `eff_cap` levels below the root — mmcs/mod.rs:96)."""
    log_max = log2_strict(data.layers[0].shape[0])
    out = []
    for m in data.matrices:
        shift = log_max - log2_strict(m.shape[0])
        out.append(m[(tree_idx >> shift).astype(jnp.int32)])
    for lvl in range(log_max - getattr(data, "eff_cap", 0)):
        out.append(
            data.layers[lvl][((tree_idx >> lvl) ^ 1).astype(jnp.int32)]
        )
    return out


# (config, air, trace shape, #publics) -> {"fn1", "fn2", "meta"}.
# meta is filled during the first traces (static structure: arity
# schedule, tree metadata, output layouts) and reused for host assembly.
_PROGRAM_CACHE: dict = {}


def prove_fast(config, air, trace, public_values, spans=None) -> Proof:
    """prove() with the device transcript where the config allows it."""
    try:
        return _prove_device_fs(config, air, trace, public_values, spans)
    except _Unsupported:
        return prove(config, air, trace, public_values, spans=spans)


def _device_body_p1(config, air, trace, publics_m, meta, stop=None):
    """Program 1 of the split device prover: trace commit -> alpha ->
    quotient -> zeta -> ys coefficient dots.

    Returns (small, carry): `small` is one flat u32 vector to PULL
    (transcript validity flags, the two commitments, the ys wire
    values); `carry` is the pytree of device-resident arrays program 2
    consumes (LDE matrices, Merkle digest layers, ys, zeta). Static
    structure is recorded in `meta`.

    `stop` (profiling only — tools/profile_stages.py): truncate the
    program at a named phase boundary and return a tiny probe (modular
    sums of the phase outputs, so the phase compute can't be dead-code
    eliminated and the pull stays O(bytes)-free). The shipped path
    always passes stop=None."""
    F, E, pcs = config.F, config.E, config.pcs

    def _probe(arrs):
        return jnp.stack(
            [F.sum(a.reshape(-1).astype(jnp.uint32), axis=0) for a in arrs]
        )

    params = pcs.fri
    n = trace.shape[0]
    log_n = log2_strict(n)
    log_num_chunks = get_log_num_quotient_chunks(air)
    num_chunks = 1 << log_num_chunks

    # ---- commit trace ----
    trace_domain = pcs.natural_domain_for_degree(n)
    trace_data = _pcs_commit_lazy(pcs, [(trace_domain, trace)])
    kind = "keccak" if config.challenger_kind == "keccak" else "duplex"
    if kind == "keccak":
        if trace_data.digest_is_field:
            raise _Unsupported("keccak transcript needs word digests")
        ch = DeviceSerializingChallenger32(F)
    else:
        # the reference's Poseidon2 benchmark config: field digests +
        # DuplexChallenger 24/16 (examples/src/types.rs:44-62)
        if not trace_data.digest_is_field:
            raise _Unsupported("duplex transcript needs field digests")
        from ..challenger.device_duplex import DeviceDuplexChallenger
        from ..hashes.poseidon2 import default_poseidon2

        ch = DeviceDuplexChallenger(F, default_poseidon2(F, 24), rate=16)
    ch.observe_host_ints([log_n, log_n, 0])
    trace_root_dev = trace_data.commit_dev
    ch.observe_words(trace_root_dev)
    ch.observe_words(publics_m)  # already Monty-form, same wire words
    if stop == "trace_commit":
        return _probe([trace_root_dev])

    alpha_m = ch.sample_fields_m(E.D)  # (D,) monty device

    # ---- quotient ----
    quotient_domain = trace_domain.create_disjoint_domain(
        1 << (log_n + log_num_chunks)
    )
    uses_next = air.main_next_row_columns() != []
    q_order = "bitrev" if not uses_next else "natural"
    trace_on_qd = pcs.get_evaluations_on_domain(
        trace_data, 0, quotient_domain, order=q_order
    )
    num_constraints, _ = get_symbolic_layout(air)
    ap_log = max(1, (num_constraints - 1).bit_length())
    alpha_pows = _ext_powers_device(E, alpha_m, ap_log)[
        :num_constraints
    ][::-1]
    q_vals = quotient_values(
        config, air, trace_domain, quotient_domain, trace_on_qd,
        publics_m, alpha_pows, rows_order=q_order,
    )
    if q_order == "bitrev":
        q_vals = bitrev_permute_axis0(q_vals, quotient_domain.log_n)
    q_flat = q_vals.reshape(quotient_domain.size, E.D)
    if stop == "quotient_vals":
        return _probe([trace_root_dev, q_flat])
    sub_evals = quotient_domain.split_evals(num_chunks, q_flat)
    sub_domains = quotient_domain.split_domains(num_chunks)
    quotient_data = _pcs_commit_lazy(pcs, list(zip(sub_domains, sub_evals)))
    quotient_root_dev = quotient_data.commit_dev
    ch.observe_words(quotient_root_dev)
    if stop == "quotient_commit":
        return _probe([trace_root_dev, quotient_root_dev])

    zeta_m = ch.sample_fields_m(E.D)
    gen_m = jnp.uint32(F.to_monty_h(trace_domain.gen))
    zeta_next_m = F.mul(zeta_m, gen_m)  # coordinate-wise base mul

    # ---- open: ys via MXU coefficient dots, observed on device ----
    trace_points = [zeta_m, zeta_next_m] if uses_next else [zeta_m]
    data_with_points = [
        (trace_data, [trace_points]),
        (quotient_data, [[zeta_m]] * num_chunks),
    ]
    lb = params.log_blowup
    all_heights = [
        m.shape[0]
        for data, _ in data_with_points
        for m in data.matrices
    ]
    log_global_max_height = max(log2_strict(h) for h in all_heights)

    max_h_for_point = {}  # id(z) -> (z_m, max h)
    for data, points in data_with_points:
        for mat, pts in zip(data.matrices, points):
            for z in pts:
                prev = max_h_for_point.get(id(z), (z, 0))[1]
                max_h_for_point[id(z)] = (z, max(prev, mat.shape[0]))

    g_inv_m = jnp.uint32(F.to_monty_h(F.inv_h(F.GENERATOR)))
    zpows = {
        zid: _ext_powers_device(
            E, F.mul(z, g_inv_m), log2_strict(h) - lb
        )
        for zid, (z, h) in max_h_for_point.items()
    }
    ys_devs = []  # flat, transcript order
    for data, points in data_with_points:
        for cf, pts in zip(data.coeffs, points):
            for z in pts:
                ys_devs.append(_eval_coeffs(E, cf, zpows[id(z)]))
    if stop == "ys":
        return _probe([trace_root_dev, quotient_root_dev, *ys_devs])

    # Program 1 ends at the alpha2 boundary. HOW alpha2 is sampled is
    # config-dependent (the ys stream is ~11k words — a ~320-block /
    # ~690-block SEQUENTIAL absorb chain, pure latency):
    #   keccak: host_alpha2 — the host C keccak (~2 Mhash/s) replays
    #     the pulled wire values in <1 ms, vs 294 ms measured for the
    #     same chain on device (tools/profile_stages.py). Program 2 is
    #     seeded with the replayed digest state (_prove_device_fs).
    #   duplex + native/poseidon2.c available: same host replay (the C
    #     duplex chain runs the ~690 permutations in ~1 ms).
    #   duplex without the native kernel: the host Poseidon2 is
    #     exact-int Python (~2 ms/perm → ~1.4 s for the chain, measured
    #     as a 2.2x END-TO-END regression when host-replayed), so the
    #     absorb + alpha2 stay ON DEVICE and the post-sample sponge
    #     state is carried straight into program 2 — no host replay.
    # The p2 seeding is byte-exact either way: every sample in this
    # protocol is followed by an observe, which clears sampling
    # leftovers on both transcript models.
    if kind == "keccak":
        host_alpha2 = True
    else:
        from ..native import have_poseidon2

        host_alpha2 = have_poseidon2()
    if host_alpha2:
        alpha2_carry = ()
    else:
        for ys in ys_devs:
            ch.observe_words(ys)  # row-major (w, D) == per-elt observe
        alpha2_m = ch.sample_fields_m(E.D)
        alpha2_carry = (alpha2_m, ch.state)
    flags_p1 = (
        jnp.stack(ch.flags).astype(jnp.uint32)
        if ch.flags else jnp.zeros((0,), jnp.uint32)
    )
    small = [flags_p1, trace_root_dev, quotient_root_dev, *ys_devs]
    meta.update(
        uses_next=uses_next,
        num_chunks=num_chunks,
        n_ys=len(ys_devs),
        log_n=log_n,
        log_global_max_height=log_global_max_height,
        digest_is_field=trace_data.digest_is_field,
        n_flags_p1=int(flags_p1.shape[0]),
        shapes_p1=[tuple(a.shape) for a in small],
        trace_eff_cap=trace_data.eff_cap,
        quotient_eff_cap=quotient_data.eff_cap,
        host_alpha2=host_alpha2,
    )
    carry = (
        tuple(trace_data.matrices), tuple(trace_data.layers),
        tuple(quotient_data.matrices), tuple(quotient_data.layers),
        tuple(ys_devs), zeta_m, alpha2_carry,
    )
    small_flat = jnp.concatenate(
        [a.reshape(-1).astype(jnp.uint32) for a in small]
    )
    return small_flat, carry


class _CarriedTree:
    """Merkle prover data reconstructed from program-1 carry (matrices +
    digest layers + the static cap height) — duck-typed for
    `_tree_gathers`."""

    def __init__(self, matrices, layers, eff_cap):
        self.matrices = list(matrices)
        self.layers = list(layers)
        self.eff_cap = eff_cap


def _device_body_p2(config, air, carry, alpha2_m, seed, meta, stop=None):
    """Program 2: reduced-opening accumulation -> FRI commit phase ->
    PoW grind -> query gathers, with the transcript seeded from the host
    replay (`seed`: the 8 keccak digest words, or the (width,) Monty
    duplex sponge state). Returns one flat u32 vector; extends `meta`
    with the FRI structure discovered at trace time."""
    F, E, pcs = config.F, config.E, config.pcs

    def _probe(arrs):
        return jnp.stack(
            [F.sum(a.reshape(-1).astype(jnp.uint32), axis=0) for a in arrs]
        )

    params = pcs.fri
    (trace_mats, trace_layers, q_mats, q_layers, ys_devs, zeta_m,
     _a2c) = carry
    trace_data = _CarriedTree(trace_mats, trace_layers,
                              meta["trace_eff_cap"])
    quotient_data = _CarriedTree(q_mats, q_layers,
                                 meta["quotient_eff_cap"])
    uses_next = meta["uses_next"]
    num_chunks = meta["num_chunks"]
    log_n = meta["log_n"]
    log_global_max_height = meta["log_global_max_height"]

    if config.challenger_kind == "keccak":
        ch = DeviceSerializingChallenger32(F)
        ch.digest = seed
    else:
        from ..challenger.device_duplex import DeviceDuplexChallenger
        from ..hashes.poseidon2 import default_poseidon2

        ch = DeviceDuplexChallenger(F, default_poseidon2(F, 24), rate=16)
        ch.state = seed

    trace_domain = pcs.natural_domain_for_degree(1 << log_n)
    gen_m = jnp.uint32(F.to_monty_h(trace_domain.gen))
    zeta_next_m = F.mul(zeta_m, gen_m)
    trace_points = [zeta_m, zeta_next_m] if uses_next else [zeta_m]
    data_with_points = [
        (trace_data, [trace_points]),
        (quotient_data, [[zeta_m]] * num_chunks),
    ]
    max_h_for_point = {}  # id(z) -> (z_m, max h)
    for data, points in data_with_points:
        for mat, pts in zip(data.matrices, points):
            for z in pts:
                prev = max_h_for_point.get(id(z), (z, 0))[1]
                max_h_for_point[id(z)] = (z, max(prev, mat.shape[0]))

    xs_br = bitrev_permute_axis0(
        powers_device(
            F, F.two_adic_generator_h(log_global_max_height),
            1 << log_global_max_height, scale_std=F.GENERATOR,
        ),
        log_global_max_height,
    )
    inv_denoms = {
        zid: _inv_denom_kernel(E, z, xs_br[:h])
        for zid, (z, h) in max_h_for_point.items()
    }

    total_w = sum(
        m.shape[1] * len(pts)
        for data, points in data_with_points
        for m, pts in zip(data.matrices, points)
    )
    a2_log = max(1, (total_w - 1).bit_length())
    a2_pows = _ext_powers_device(E, alpha2_m, a2_log)  # ascending

    reduced, num_reduced = {}, {}
    ys_iter = iter(ys_devs)
    for data, points in data_with_points:
        for mat, pts in zip(data.matrices, points):
            h, w = mat.shape
            log_h = log2_strict(h)
            mat_compressed = _mred(E, mat, a2_pows[:w])
            for z in pts:
                ys_dev = next(ys_iter)
                acc = reduced.setdefault(
                    log_h, jnp.zeros((h, E.D), jnp.uint32)
                )
                nr = num_reduced.get(log_h, 0)
                prods = E.mul(a2_pows[:w], ys_dev)  # (w, D)
                mred_z = F.sum(prods, axis=0)  # (D,)
                reduced[log_h] = _accum_kernel(
                    E, acc, mred_z, mat_compressed,
                    inv_denoms[id(z)][:h], a2_pows[nr],
                )
                num_reduced[log_h] = nr + w
    fri_input = [reduced[lh] for lh in sorted(reduced, reverse=True)]
    if stop == "accum":
        return _probe([alpha2_m, *fri_input])

    # ---- FRI commit phase: every round on device ----
    fri_mmcs_inner = pcs.fri_mmcs.inner
    folded = fri_input[0]
    rest = list(fri_input[1:])
    log_final_height = params.log_blowup + params.log_final_poly_len
    datas, log_arities, commit_pow_devs = [], [], []
    while folded.shape[0] > params.blowup * params.final_poly_len:
        log_h = log2_strict(folded.shape[0])
        next_log_h = log2_strict(rest[0].shape[0]) if rest else None
        log_arity = compute_log_arity_for_round(
            log_h, next_log_h, log_final_height, params.max_log_arity
        )
        arity = 1 << log_arity
        log_arities.append(log_arity)
        data = _mmcs_commit_lazy(
            fri_mmcs_inner, [folded.reshape(-1, arity * E.D)]
        )
        ch.observe_words(data.commit_dev)
        datas.append(data)
        if params.commit_proof_of_work_bits:
            w_dev, beta_m = ch.grind_then_sample_fields(
                params.commit_proof_of_work_bits, E.D
            )
            commit_pow_devs.append(w_dev)
        else:
            beta_m = ch.sample_fields_m(E.D)

        b = beta_m
        for _ in range(log_arity):
            folded = _fold_step_jit(E, folded, b)
            b = E.mul(b, b)
        if rest and rest[0].shape[0] == folded.shape[0]:
            folded = F.add(folded, E.mul(rest.pop(0), b))

    # ---- final polynomial ----
    L = params.final_poly_len
    final_evals = folded[:L]
    if L > 1:
        final_coeffs = idft(
            F, bitrev_permute_axis0(final_evals, log2_strict(L))
        )
    else:
        final_coeffs = final_evals
    ch.observe_words(final_coeffs)
    ch.observe_host_ints(log_arities)  # arity schedule (prover.rs:103)
    if stop == "fri":
        return _probe(
            [alpha2_m, final_coeffs] + [d.commit_dev for d in datas]
        )

    # ---- device grind + query indices + gathers ----
    witness_dev, idx_dev = ch.grind_and_sample_indices(
        params.query_proof_of_work_bits,
        params.num_queries,
        log_global_max_height,  # extra_query_index_bits == 0 (two-adic)
    )
    if stop == "grind":
        return _probe(
            [final_coeffs, witness_dev.reshape(1), idx_dev]
        )
    gathers = []
    input_tree_meta = []  # (log_batch_max, n_mats, proof levels)
    for data, _ in data_with_points:
        log_batch_max = log2_strict(data.layers[0].shape[0])
        tree_idx = idx_dev >> (log_global_max_height - log_batch_max)
        gathers.extend(_tree_gathers(data, tree_idx))
        input_tree_meta.append(
            (log_batch_max, len(data.matrices),
             log_batch_max - data.eff_cap)
        )
    ridx = idx_dev
    fri_tree_levels = []  # proof levels per round (cap-clamped)
    for log_arity, data in zip(log_arities, datas):
        ridx = ridx >> log_arity
        gathers.extend(_tree_gathers(data, ridx))
        fri_tree_levels.append(
            log2_strict(data.layers[0].shape[0]) - data.eff_cap
        )

    # ---- one flat output buffer ----
    flags = (
        jnp.stack(ch.flags).astype(jnp.uint32)
        if ch.flags else jnp.zeros((0,), jnp.uint32)
    )
    fri_roots = [d.commit_dev for d in datas]
    pow_out = (
        [jnp.stack(commit_pow_devs)] if commit_pow_devs else []
    )
    outs = [flags, *fri_roots, *pow_out, final_coeffs,
            witness_dev.reshape(1), idx_dev, *gathers]
    meta.update(
        log_arities=log_arities,
        input_tree_meta=input_tree_meta,
        fri_tree_levels=fri_tree_levels,
        n_flags_p2=int(flags.shape[0]),
        n_commit_pow=len(commit_pow_devs),
        shapes_p2=[tuple(a.shape) for a in outs],
    )
    return jnp.concatenate([a.reshape(-1).astype(jnp.uint32) for a in outs])


def _prove_device_fs(config, air, trace, public_values, spans=None):
    import time as _time

    _t = {"last": _time.perf_counter()}

    def _mark(name):
        if spans is not None:
            now = _time.perf_counter()
            spans[name] = spans.get(name, 0.0) + now - _t["last"]
            _t["last"] = now

    F, E, pcs = config.F, config.E, config.pcs
    if config.challenger_factory:
        raise _Unsupported("custom challenger factory; use prove()")
    if not isinstance(pcs, TwoAdicFriPcs) or getattr(pcs, "ZK", False):
        raise _Unsupported("fast path covers the non-ZK TwoAdicFriPcs")
    params = pcs.fri
    if params.query_proof_of_work_bits == 0:
        raise _Unsupported("grind(0) path not wired; use prove()")

    key = (config, air, trace.shape, len(public_values))
    entry = _PROGRAM_CACHE.get(key)
    if entry is None:
        meta = {}
        entry = {
            "meta": meta,
            "fn1": jax.jit(
                lambda tr, pm: _device_body_p1(config, air, tr, pm, meta)
            ),
            "fn2": None,  # traced after the first p1 execution
        }
    meta = entry["meta"]

    publics_m = jnp.asarray(
        F.to_monty_np(np.asarray(public_values, dtype=np.uint32))
    ) if public_values else jnp.zeros((0,), jnp.uint32)

    # ---- program 1: commit / quotient / ys (raises _Unsupported at
    # trace time if the config is out of scope) ----
    small, carry = entry["fn1"](trace, publics_m)
    _mark("p1 dispatch")
    small_np = np.asarray(small)
    _mark("p1 pull (flags + roots + ys)")

    pulled, off = [], 0
    for shape in meta["shapes_p1"]:
        cnt = int(np.prod(shape, dtype=np.int64))
        pulled.append(small_np[off:off + cnt].reshape(shape))
        off += cnt
    it = iter(pulled)
    flags_p1 = next(it)
    if not flags_p1.all():
        # a sampling supply ran short — valid proofs are impossible
        # from this transcript; redo on host FS
        raise _Unsupported("device transcript flag tripped (program 1)")
    uses_next = meta["uses_next"]
    num_chunks = meta["num_chunks"]
    dif = meta["digest_is_field"]

    def dconv(a):
        """Digest words -> wire form: standard ints; caps nest per digest."""
        a = F.from_monty_np(a) if dif else a
        if a.ndim == 1:
            return tuple(int(x) for x in a)
        return tuple(tuple(int(x) for x in row) for row in a)

    def sconv(a):
        """Sibling-digest level array (Q, dw) -> standard-form values."""
        return F.from_monty_np(a) if dif else a

    trace_root = dconv(next(it))
    quotient_root = dconv(next(it))
    ys_np = [F.from_monty_np(next(it)) for _ in range(meta["n_ys"])]

    # ---- alpha2 + program-2 seed state ----
    if meta["host_alpha2"]:
        # keccak: the host C keccak (~2 Mhash/s) replays the transcript
        # over the pulled wire values and samples alpha2 in <1 ms — the
        # device equivalent is ~320 SEQUENTIAL permutations (~294 ms
        # measured). Every sample is followed by an observe in this
        # protocol, so seeding program 2 with the post-sample digest
        # state is byte-exact.
        hch = config.initialise_challenger()
        hch.observe(meta["log_n"])
        hch.observe(meta["log_n"])
        hch.observe(0)
        hch.observe_digest(trace_root)
        hch.observe_many(public_values)
        hch.sample_ext(E.D)  # alpha (already consumed on device)
        hch.observe_digest(quotient_root)
        hch.sample_ext(E.D)  # zeta
        for y in ys_np:
            if hasattr(hch, "observe_base_array"):
                hch.observe_base_array(y)
            else:
                for row in y.tolist():
                    hch.observe_ext(tuple(int(v) for v in row))
        alpha2 = hch.sample_ext(E.D)
        alpha2_dev = jnp.asarray(
            F.to_monty_np(np.asarray(alpha2, dtype=np.uint32))
        )
        if config.challenger_kind == "keccak":
            assert len(hch.input_buffer) == 32  # = the last flush digest
            seed = jnp.asarray(
                np.frombuffer(bytes(hch.input_buffer), dtype="<u4")
            )
        else:
            # duplex: the post-sample sponge state, in Monty (the
            # device challenger's native representation)
            seed = jnp.asarray(F.to_monty_np(
                np.asarray(hch.state, dtype=np.uint64).astype(np.uint32)
            ))
        _mark("host transcript replay (alpha2)")
    else:
        # duplex: the absorb + alpha2 ran on device in program 1 (the
        # host Poseidon2 is Python-exact and ~1000x slower than the C
        # keccak — replaying ~690 permutations there measured a 2.2x
        # end-to-end regression); the post-sample sponge state came
        # back in the carry.
        alpha2_dev, seed = carry[-1]

    # ---- program 2: accumulation / FRI / grind / query gathers ----
    if entry["fn2"] is None:
        entry["fn2"] = jax.jit(
            lambda c, a2, s: _device_body_p2(config, air, c, a2, s, meta)
        )
    flat = entry["fn2"](carry, alpha2_dev, seed)
    _PROGRAM_CACHE[key] = entry  # cache only after successful traces
    _mark("p2 dispatch")
    flat_np = np.asarray(flat)
    _mark("p2 pull")

    pulled, off = [], 0
    for shape in meta["shapes_p2"]:
        cnt = int(np.prod(shape, dtype=np.int64))
        pulled.append(flat_np[off:off + cnt].reshape(shape))
        off += cnt
    it = iter(pulled)
    flags_np = next(it)
    if not flags_np.all():
        # the PoW replay failed or a supply ran short — redo on host FS
        raise _Unsupported("device transcript flag tripped (program 2)")
    log_arities = meta["log_arities"]
    log_global_max_height = meta["log_global_max_height"]
    n_fri_rounds = len(log_arities)
    num_queries = params.num_queries

    fri_commits = [dconv(next(it)) for _ in range(n_fri_rounds)]
    if meta["n_commit_pow"]:
        commit_pows = [int(x) for x in next(it)]
    else:
        commit_pows = [0] * n_fri_rounds
    final_np = F.from_monty_np(next(it))
    final_poly = [tuple(int(c) for c in row) for row in final_np]
    witness = int(next(it)[0])
    indices = [int(x) for x in next(it)]

    # opened values in round/matrix/point structure: round 0 is one
    # matrix (trace) with 1-2 points; round 1 is num_chunks matrices
    # with one point each
    opened_values = []
    ys_it = iter(ys_np)
    opened_values.append([
        [[tuple(r) for r in next(ys_it).tolist()]
         for _ in range(2 if uses_next else 1)]
    ])
    opened_values.append([
        [[tuple(r) for r in next(ys_it).tolist()]]
        for _ in range(num_chunks)
    ])

    # input-tree openings (pruned proofs from the per-level gathers)
    input_openings = []
    for log_batch_max, n_mats, levels in meta["input_tree_meta"]:
        tree_indices = [
            i >> (log_global_max_height - log_batch_max) for i in indices
        ]
        mat_lists = [
            F.from_monty_np(next(it)).reshape(num_queries, -1).tolist()
            for _ in range(n_mats)
        ]
        sib_levels = [sconv(next(it)) for _ in range(levels)]
        rows_pq = [
            [mat_lists[k][q] for k in range(n_mats)]
            for q in range(num_queries)
        ]
        input_openings.append(BatchMultiOpening(
            opened_values=rows_pq,
            opening_proof=_pruned_wire(
                tree_indices, levels, sib_levels
            ),
        ))

    # FRI round openings
    commit_phase_steps = []
    qidx = list(indices)
    for log_arity, levels in zip(log_arities, meta["fri_tree_levels"]):
        arity = 1 << log_arity
        row_indices = [i >> log_arity for i in qidx]
        rows = F.from_monty_np(next(it)).reshape(
            num_queries, arity, E.D
        ).tolist()
        sib_levels = [sconv(next(it)) for _ in range(levels)]
        sibs = []
        for idx, grp in zip(qidx, rows):
            pos = idx % arity
            sibs.append(
                [tuple(g) for j, g in enumerate(grp) if j != pos]
            )
        commit_phase_steps.append(CommitPhaseStep(
            log_arity=log_arity,
            sibling_values=sibs,
            opening_proof=_pruned_wire(row_indices, levels, sib_levels),
        ))
        qidx = row_indices

    fri_proof = FriProof(
        commit_phase_commits=fri_commits,
        commit_pow_witnesses=commit_pows,
        input_openings=input_openings,
        commit_phase_steps=commit_phase_steps,
        final_poly=final_poly,
        query_pow_witness=witness,
    )
    _mark("proof assembly")
    return Proof(
        commitments=Commitments(
            trace=trace_root, quotient_chunks=quotient_root
        ),
        opened_values=OpenedValues(
            trace_local=opened_values[0][0][0],
            trace_next=opened_values[0][0][1] if uses_next else None,
            quotient_chunks=[opened_values[1][i][0]
                             for i in range(num_chunks)],
        ),
        opening_proof=fri_proof,
        degree_bits=meta["log_n"],
    )
