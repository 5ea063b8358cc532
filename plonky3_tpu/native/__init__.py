"""Native host kernels (C, via ctypes).

The TPU owns the wide batched compute; these serve the host tails where
Python/numpy per-call overhead dominates: the Fiat-Shamir keccak chain,
small Merkle layers, PoW grinding, verifier digest walks. Built lazily
with the system compiler on first import; every caller has a pure
numpy/Python fallback, so a missing toolchain only costs speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libp3keccak.so")
_SRC = os.path.join(_DIR, "keccak.c")
_SRC_P2 = os.path.join(_DIR, "poseidon2.c")

_lib = None


def _build() -> bool:
    for flags in (["-O3", "-march=native"], ["-O3"]):
        for cc in ("cc", "gcc", "clang"):
            try:
                r = subprocess.run(
                    [cc, *flags, "-shared", "-fPIC", _SRC, _SRC_P2,
                     "-o", _SO],
                    capture_output=True,
                    timeout=120,
                )
                if r.returncode == 0:
                    return True
            except (OSError, subprocess.TimeoutExpired):
                continue
    return False


def _load():
    global _lib
    if os.environ.get("P3_NO_NATIVE"):
        return None
    if _lib is not None:
        return _lib
    newest_src = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_P2))
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest_src:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    try:
        # poseidon2.c symbols (absent in a stale pre-poseidon2 .so whose
        # rebuild failed — keccak keeps working, p2 reports unavailable)
        _u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.p3_p2_permute.argtypes = [
            _u32p, ctypes.c_uint32, ctypes.c_int, ctypes.c_int,
            _u32p, ctypes.c_int, _u32p, ctypes.c_int, _u32p,
            ctypes.c_int, _u32p,
        ]
        lib.p3_p2_duplex_chain.argtypes = [
            _u32p, _u32p, ctypes.c_size_t, ctypes.c_uint32,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _u32p, ctypes.c_int, _u32p, ctypes.c_int, _u32p,
            ctypes.c_int, _u32p,
        ]
        lib._have_p2 = True
    except AttributeError:
        lib._have_p2 = False
    lib.p3_keccakf_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_size_t,
    ]
    lib.p3_keccak256.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.p3_keccak256_rows.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_size_t,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.p3_keccak256_grind.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_size_t,
        ctypes.c_uint32,
    ]
    lib.p3_keccak256_grind.restype = ctypes.c_int64
    _lib = lib
    return lib


HAVE_NATIVE = _load() is not None


def keccakf_batch_u32(lo: np.ndarray, hi: np.ndarray):
    """keccak-f[1600] on (n, 25) u32 (lo, hi) lane pairs. Returns new
    (lo, hi) or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = lo.shape[0]
    # (n, 25, 2) u32 interleave IS the little-endian u64 state layout
    st32 = np.empty((n, 25, 2), dtype=np.uint32)
    st32[..., 0] = lo
    st32[..., 1] = hi
    lib.p3_keccakf_batch(
        st32.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n
    )
    return st32[..., 0].copy(), st32[..., 1].copy()


def keccak256(data: bytes):
    """One-shot Keccak-256 (0x01 padding) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = (ctypes.c_uint8 * 32)()
    lib.p3_keccak256(data, len(data), out)
    return bytes(out)


def keccak256_rows(rows: np.ndarray):
    """Keccak-256 of each row of a (n, L) uint8 array -> (n, 32) uint8,
    or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    n, L = rows.shape
    out = np.empty((n, 32), dtype=np.uint8)
    lib.p3_keccak256_rows(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        L,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def _p2_lib():
    lib = _load()
    if lib is None or not getattr(lib, "_have_p2", False):
        return None
    return lib


def have_poseidon2() -> bool:
    """True when the native Poseidon2 permutation is available."""
    return _p2_lib() is not None


def _u32arr(a):
    a = np.ascontiguousarray(a, dtype=np.uint32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def poseidon2_permute(state: np.ndarray, P: int, width: int, d: int,
                      rc_ei: np.ndarray, rc_int: np.ndarray,
                      rc_ef: np.ndarray, diag: np.ndarray):
    """One Poseidon2 permutation on a (width,) standard-form u32 state.
    Constants in standard form ((n_rounds, width) external tables,
    (n_int,) internal, (width,) diagonal). Returns the new (width,)
    array, or None if the native library is unavailable."""
    lib = _p2_lib()
    if lib is None:
        return None
    st = np.array(state, dtype=np.uint32)  # owned, mutated in place
    _, stp = _u32arr(st)
    ei, eip = _u32arr(rc_ei)
    ii, iip = _u32arr(rc_int)
    ef, efp = _u32arr(rc_ef)
    dg, dgp = _u32arr(diag)
    lib.p3_p2_permute(
        stp, P, width, d, eip, ei.shape[0], iip, ii.shape[0],
        efp, ef.shape[0], dgp,
    )
    return st


def poseidon2_duplex_chain(state: np.ndarray, blocks: np.ndarray,
                           P: int, width: int, rate: int, d: int,
                           rc_ei: np.ndarray, rc_int: np.ndarray,
                           rc_ef: np.ndarray, diag: np.ndarray):
    """Absorb (nb, rate) standard-form full blocks into a (width,)
    duplex sponge state (overwrite rate lanes, add the length tag,
    permute — per block). Returns the new state or None."""
    lib = _p2_lib()
    if lib is None:
        return None
    st = np.array(state, dtype=np.uint32)
    _, stp = _u32arr(st)
    bl, blp = _u32arr(blocks)
    nb = bl.shape[0]
    ei, eip = _u32arr(rc_ei)
    ii, iip = _u32arr(rc_int)
    ef, efp = _u32arr(rc_ef)
    dg, dgp = _u32arr(diag)
    lib.p3_p2_duplex_chain(
        stp, blp, nb, P, width, rate, d, eip, ei.shape[0],
        iip, ii.shape[0], efp, ef.shape[0], dgp,
    )
    return st


def keccak256_grind(prefix: bytes, wire: np.ndarray, mask: int):
    """First index i with (digest_pow_value(prefix || wire[i]) & mask)
    == 0, or -1; None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    wire = np.ascontiguousarray(wire, dtype=np.uint32)
    return int(
        lib.p3_keccak256_grind(
            prefix,
            len(prefix),
            wire.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            wire.shape[0],
            mask & 0xFFFFFFFF,
        )
    )
