"""Poseidon2 permutation, generic over a ring backend.

Behavioral spec from the reference (`poseidon2/src/lib.rs:139` permute =
external-initial -> internal -> external-terminal;
`poseidon2/src/external.rs:113` MDS-light external matrix = circ(2M4, M4,..)
with M4 = [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]];
`monty-31/src/poseidon2.rs:77-90` internal round = rc+sbox on lane 0 then
J + Diag(V) with per-field diagonal V, V[0] = -2).

One implementation, three backends — the TPU analog of the reference's
`GenericPoseidon2LinearLayers` (`poseidon2/src/generic.rs:32`) shared by the
permutation and the AIR:
  * DeviceOps: jnp uint32 Monty lanes, batched over thousands of states
    (the TPU replacement for AVX2/AVX-512/NEON kernels in
    monty-31/src/*/poseidon2.rs) — the batch axis is the vector axis.
  * HostOps: exact python ints (transcript / verifier side).
  * (air backends plug in the same `permute` via the ops protocol.)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..fields.monty31 import Monty31

# Per-field internal diagonals V as (numerator, log2_denominator) pairs;
# value = num / 2^log2_den mod P. Entry 0 is always -2 (handled via the
# part_sum - s0 identity). Sources: koala-bear/src/poseidon2.rs:10-15,
# baby-bear/src/poseidon2.rs:10-15 (doc comments + internal_layer_mat_mul).
DIAGONALS = {
    ("KoalaBear", 16): [
        (-2, 0), (1, 0), (2, 0), (1, 1), (3, 0), (4, 0), (-1, 1), (-3, 0),
        (-4, 0), (1, 8), (1, 3), (1, 24), (-1, 8), (-1, 3), (-1, 4), (-1, 24),
    ],
    ("KoalaBear", 24): [
        (-2, 0), (1, 0), (2, 0), (1, 1), (3, 0), (4, 0), (-1, 1), (-3, 0),
        (-4, 0), (1, 8), (1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (1, 24),
        (-1, 8), (-1, 3), (-1, 4), (-1, 5), (-1, 6), (-1, 7), (-1, 9),
        (-1, 24),
    ],
    ("BabyBear", 16): [
        (-2, 0), (1, 0), (2, 0), (1, 1), (3, 0), (4, 0), (-1, 1), (-3, 0),
        (-4, 0), (1, 8), (1, 2), (1, 3), (1, 27), (-1, 8), (-1, 4), (-1, 27),
    ],
    ("BabyBear", 24): [
        (-2, 0), (1, 0), (2, 0), (1, 1), (3, 0), (4, 0), (-1, 1), (-3, 0),
        (-4, 0), (1, 8), (1, 2), (1, 3), (1, 4), (1, 7), (1, 9), (1, 27),
        (-1, 8), (-1, 2), (-1, 3), (-1, 4), (-1, 5), (-1, 6), (-1, 7),
        (-1, 27),
    ],
}

S_BOX_DEGREE = {"KoalaBear": 3, "BabyBear": 7, "Mersenne31": 5}


def diag_values_std(F: Monty31, width: int) -> list[int]:
    """Diagonal V as standard-form field ints."""
    out = []
    for num, log2_den in DIAGONALS[(F.name, width)]:
        v = (num * pow(pow(2, log2_den, F.P), F.P - 2, F.P)) % F.P
        out.append(v)
    return out


class DeviceOps:
    """Ring ops on batched jnp uint32 Monty lanes."""

    def __init__(self, F: Monty31):
        self.F = F

    def add(self, a, b):
        return self.F.add(a, b)

    def sub(self, a, b):
        return self.F.sub(a, b)

    def double(self, a):
        return self.F.double(a)

    def mul(self, a, b):
        return self.F.mul(a, b)

    def add_const(self, a, c_std: int):
        return self.F.add(a, self.F.const(c_std))

    def mul_const(self, a, c_std: int):
        if 0 <= c_std <= 4:
            return self.F.mul_small(a, c_std)
        return self.F.mul(a, self.F.const(c_std))


class HostOps:
    """Exact python-int ring ops (standard form)."""

    def __init__(self, F: Monty31):
        self.P = F.P

    def add(self, a, b):
        return (a + b) % self.P

    def sub(self, a, b):
        return (a - b) % self.P

    def double(self, a):
        return (2 * a) % self.P

    def mul(self, a, b):
        return (a * b) % self.P

    def add_const(self, a, c_std):
        return (a + c_std) % self.P

    def mul_const(self, a, c_std):
        return (a * c_std) % self.P


def _apply_mat4(ops, x):
    """x <- M4 @ x with M4 = [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]].

    Add/double chain per Poseidon2 paper Appendix B (external.rs:54-75).
    """
    t01 = ops.add(x[0], x[1])
    t23 = ops.add(x[2], x[3])
    t0123 = ops.add(t01, t23)
    t01123 = ops.add(t0123, x[1])
    t01233 = ops.add(t0123, x[3])
    return [
        ops.add(t01123, t01),  # 2*x0 + 3*x1 + x2 + x3
        ops.add(t01123, ops.double(x[2])),  # x0 + 2*x1 + 3*x2 + x3
        ops.add(t01233, t23),  # x0 + x1 + 2*x2 + 3*x3
        ops.add(t01233, ops.double(x[0])),  # 3*x0 + x1 + x2 + 2*x3
    ]


def mds_light(ops, state):
    """External linear layer: per-4-block M4 then outer circulant
    (external.rs:113-160). Widths 2/3 use the sum form."""
    w = len(state)
    if w == 2:
        s = ops.add(state[0], state[1])
        return [ops.add(state[0], s), ops.add(state[1], s)]
    if w == 3:
        s = ops.add(ops.add(state[0], state[1]), state[2])
        return [ops.add(x, s) for x in state]
    assert w % 4 == 0
    st = []
    for c in range(0, w, 4):
        st.extend(_apply_mat4(ops, state[c : c + 4]))
    sums = []
    for k in range(4):
        acc = st[k]
        for j in range(4 + k, w, 4):
            acc = ops.add(acc, st[j])
        sums.append(acc)
    return [ops.add(st[i], sums[i % 4]) for i in range(w)]


def _sbox(ops, x, d: int):
    if d == 3:
        return ops.mul(ops.mul(x, x), x)
    if d == 5:
        x2 = ops.mul(x, x)
        return ops.mul(ops.mul(x2, x2), x)
    if d == 7:
        x2 = ops.mul(x, x)
        x4 = ops.mul(x2, x2)
        return ops.mul(ops.mul(x4, x2), x)
    raise ValueError(f"unsupported s-box degree {d}")


@dataclass(frozen=True)
class Poseidon2:
    """A concrete Poseidon2 instance (field, width, constants)."""

    F: Monty31
    width: int
    d: int
    rc_external_initial: tuple  # (half_rounds, width) standard ints
    rc_external_final: tuple
    rc_internal: tuple  # (partial_rounds,) standard ints

    def __post_init__(self):
        object.__setattr__(
            self, "diag_std", diag_values_std(self.F, self.width)
        )

    # ------------------------------------------------------------------
    def permute(self, ops, state):
        """Generic permutation over a list of `width` lane objects."""
        assert len(state) == self.width
        state = mds_light(ops, state)
        for rc in self.rc_external_initial:
            state = self._external_round(ops, state, rc)
        for rc in self.rc_internal:
            state = self._internal_round(ops, state, rc)
        for rc in self.rc_external_final:
            state = self._external_round(ops, state, rc)
        return state

    def _external_round(self, ops, state, rc):
        state = [
            _sbox(ops, ops.add_const(x, c), self.d)
            for x, c in zip(state, rc)
        ]
        return mds_light(ops, state)

    def _internal_round(self, ops, state, rc):
        s0 = _sbox(ops, ops.add_const(state[0], rc), self.d)
        part = state[1]
        for x in state[2:]:
            part = ops.add(part, x)
        full = ops.add(part, s0)
        new = [ops.sub(part, s0)]
        for i in range(1, self.width):
            num, log2_den = DIAGONALS[(self.F.name, self.width)][i]
            if log2_den == 0 and 0 < num <= 4:
                term = ops.mul_const(state[i], num)
                new.append(ops.add(full, term))
            elif log2_den == 0 and -4 <= num < 0:
                term = ops.mul_const(state[i], -num)
                new.append(ops.sub(full, term))
            else:
                new.append(
                    ops.add(full, ops.mul_const(state[i], self.diag_std[i]))
                )
        return new

    # ------------------------------------------------------------------
    # array-form device kernel (scan over rounds -> small HLO graph)
    # ------------------------------------------------------------------
    def _device_consts(self):
        """Round constants / diagonal as device-ready Monty uint32 arrays."""
        cached = getattr(self, "_dc", None)
        if cached is None:
            F = self.F

            def to_m(xs):
                return F.to_monty_np(np.asarray(xs, dtype=np.uint32))

            cached = dict(
                rc_ei=to_m(self.rc_external_initial),
                rc_ef=to_m(self.rc_external_final),
                rc_int=to_m(self.rc_internal),
                diag=to_m(self.diag_std),
            )
            object.__setattr__(self, "_dc", cached)
        return cached

    def _mds_light_arr(self, x):
        """External linear layer on (..., width) arrays (external.rs:113)."""
        F, w = self.F, self.width
        assert w % 4 == 0, "array kernel supports widths divisible by 4"
        b = x.reshape(x.shape[:-1] + (w // 4, 4))
        x0, x1, x2, x3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        t01 = F.add(x0, x1)
        t23 = F.add(x2, x3)
        t0123 = F.add(t01, t23)
        t01123 = F.add(t0123, x1)
        t01233 = F.add(t0123, x3)
        st = jnp.stack(
            [
                F.add(t01123, t01),
                F.add(t01123, F.double(x2)),
                F.add(t01233, t23),
                F.add(t01233, F.double(x0)),
            ],
            axis=-1,
        )  # (..., w/4, 4)
        tot = F.sum(st, axis=-2)  # (..., 4): column sums over blocks
        out = F.add(st, tot[..., None, :])
        return out.reshape(x.shape)

    def _sbox_arr(self, x):
        F = self.F
        if self.d == 3:
            return F.mul(F.square(x), x)
        if self.d == 5:
            x2 = F.square(x)
            return F.mul(F.square(x2), x)
        if self.d == 7:
            x2 = F.square(x)
            return F.mul(F.mul(F.square(x2), x2), x)
        raise ValueError(f"unsupported s-box degree {self.d}")

    def permute_device(self, states):
        """Batched device permutation: states (..., width) uint32 Monty.

        lax.scan over rounds keeps the HLO graph one-round-sized, so whole
        pipelines (LDE + full Merkle tree) stay jittable in one program.
        Jitted (shape-keyed) so eager callers share compiles too.
        """
        return _permute_device_jit(self, states)

    def _permute_device_impl(self, states):
        import jax

        F = self.F
        c = self._device_consts()
        diag = jnp.asarray(c["diag"])

        def ext_body(s, rc):
            s = F.add(s, rc)  # rc (w,) broadcasts over batch dims
            return self._mds_light_arr(self._sbox_arr(s)), None

        def int_body(s, rc):
            s0 = self._sbox_arr(F.add(s[..., 0], rc))
            s = jnp.concatenate([s0[..., None], s[..., 1:]], axis=-1)
            total = F.sum(s, axis=-1)
            # out_i = total + V_i * s_i, V[0] = -2 (poseidon2.rs:77-90)
            return F.add(total[..., None], F.mul(s, diag)), None

        x = self._mds_light_arr(states)
        x, _ = jax.lax.scan(ext_body, x, jnp.asarray(c["rc_ei"]))
        x, _ = jax.lax.scan(int_body, x, jnp.asarray(c["rc_int"]))
        x, _ = jax.lax.scan(ext_body, x, jnp.asarray(c["rc_ef"]))
        return x

    def _native_consts(self):
        """Standard-form numpy constant tables for the C kernel
        (native/poseidon2.c), or None when this instance is outside its
        scope (width not a multiple of 4, unknown diagonal, d not in
        {3,5,7})."""
        cached = getattr(self, "_nc", None)
        if cached is not None:
            return cached or None
        nc = None
        if (
            self.width % 4 == 0
            and self.d in (3, 5, 7)
            and (self.F.name, self.width) in DIAGONALS
        ):
            nc = dict(
                P=self.F.P, width=self.width, d=self.d,
                rc_ei=np.asarray(self.rc_external_initial, np.uint32),
                rc_int=np.asarray(self.rc_internal, np.uint32),
                rc_ef=np.asarray(self.rc_external_final, np.uint32),
                diag=np.asarray(self.diag_std, np.uint32),
            )
        object.__setattr__(self, "_nc", nc if nc is not None else False)
        return nc

    def permute_host(self, state):
        """Exact host permutation: list/tuple of standard-form ints.

        Routes through the native C kernel when available (~1.5 us vs
        ~2 ms for the exact-int Python path — the duplex Fiat-Shamir
        absorb chain is sequential, so this is the transcript's
        throughput limit); the Python path is the behavioral oracle and
        the two are lockstep-tested (tests/test_poseidon2.py)."""
        nc = self._native_consts()
        if nc is not None:
            from ..native import poseidon2_permute

            out = poseidon2_permute(
                np.asarray(state, np.uint32), nc["P"], nc["width"],
                nc["d"], nc["rc_ei"], nc["rc_int"], nc["rc_ef"],
                nc["diag"],
            )
            if out is not None:
                return [int(x) for x in out]
        ops = HostOps(self.F)
        return list(self.permute(ops, list(state)))

    def permute_host_py(self, state):
        """The pure-Python exact permutation (native-path oracle)."""
        ops = HostOps(self.F)
        return list(self.permute(ops, list(state)))

    # ------------------------------------------------------------------
    # vectorized numpy kernel (host, exact, zero compiles) — for the
    # small-height tails where an XLA compile costs more than the work
    # ------------------------------------------------------------------
    def _mds_light_np(self, x):
        F, w = self.F, self.width
        assert w % 4 == 0
        b = x.reshape(x.shape[:-1] + (w // 4, 4))
        x0, x1, x2, x3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        t01 = F.add_np(x0, x1)
        t23 = F.add_np(x2, x3)
        t0123 = F.add_np(t01, t23)
        t01123 = F.add_np(t0123, x1)
        t01233 = F.add_np(t0123, x3)
        st = np.stack(
            [
                F.add_np(t01123, t01),
                F.add_np(t01123, F.double_np(x2)),
                F.add_np(t01233, t23),
                F.add_np(t01233, F.double_np(x0)),
            ],
            axis=-1,
        )
        tot = F.sum_np(st, axis=-2)
        return F.add_np(st, tot[..., None, :]).reshape(x.shape)

    def _sbox_np(self, x):
        F = self.F
        if self.d == 3:
            return F.mul_np(F.square_np(x), x)
        if self.d == 5:
            x2 = F.square_np(x)
            return F.mul_np(F.square_np(x2), x)
        if self.d == 7:
            x2 = F.square_np(x)
            return F.mul_np(F.mul_np(F.square_np(x2), x2), x)
        raise ValueError(f"unsupported s-box degree {self.d}")

    def permute_np(self, states: np.ndarray) -> np.ndarray:
        """Batched numpy permutation: states (..., width) uint32 Monty."""
        F = self.F
        c = self._device_consts()  # already host np arrays
        diag = c["diag"]
        x = self._mds_light_np(np.asarray(states))
        for rc in c["rc_ei"]:
            x = self._mds_light_np(self._sbox_np(F.add_np(x, rc)))
        for rc in c["rc_int"]:
            s0 = self._sbox_np(F.add_np(x[..., 0], rc))
            x = np.concatenate([s0[..., None], x[..., 1:]], axis=-1)
            total = F.sum_np(x, axis=-1)
            x = F.add_np(total[..., None], F.mul_np(x, diag))
        for rc in c["rc_ef"]:
            x = self._mds_light_np(self._sbox_np(F.add_np(x, rc)))
        return x


def _build(F, width, prefix, consts):
    return Poseidon2(
        F=F,
        width=width,
        d=S_BOX_DEGREE[F.name],
        rc_external_initial=getattr(
            consts, f"{prefix}_POSEIDON2_RC_{width}_EXTERNAL_INITIAL"
        ),
        rc_external_final=getattr(
            consts, f"{prefix}_POSEIDON2_RC_{width}_EXTERNAL_FINAL"
        ),
        rc_internal=getattr(consts, f"{prefix}_POSEIDON2_RC_{width}_INTERNAL"),
    )


def default_poseidon2(F: Monty31, width: int) -> Poseidon2:
    """The default instances (reference `default_*_poseidon2_*()`,
    koala-bear/src/poseidon2.rs:190)."""
    from .constants import poseidon2_constants as consts

    prefix = F.name.upper()
    return _build(F, width, prefix, consts)


import functools as _functools

import jax as _jax


@_functools.partial(_jax.jit, static_argnums=0)
def _permute_device_jit(perm: Poseidon2, states):
    return perm._permute_device_impl(states)
