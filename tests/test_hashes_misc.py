"""BLAKE3 / SHA-256 kernels: official vectors + device/host lockstep."""

import hashlib

import numpy as np
import pytest

from plonky3_tpu.hashes.blake3 import (
    IV as B3_IV,
    blake3,
    compress_arrays as b3_compress,
    compress_device as b3_compress_device,
)
from plonky3_tpu.hashes.sha256 import (
    IV as SHA_IV,
    compress_arrays as sha_compress,
    sha256_compress,
)


# official BLAKE3 test vectors (input byte i = i % 251)
B3_VECTORS = {
    0: "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262",
    1: "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213",
    1024: "42214739f095a406f3fc83deb889744ac00df831c10daa55189b5d121c855af7",
    2048: "e776b6028c7cd22a4d0ba182a8bf62205d2ef576467e838ed6f2529b85fba24a",
    3072: "b98cb0ff3623be03326b373de6b9095218513e64f1ee2edd2525c7ad1e5cffd2",
}


@pytest.mark.parametrize("n", sorted(B3_VECTORS))
def test_blake3_official_vectors(n):
    msg = bytes(i % 251 for i in range(n))
    assert blake3(msg).hex() == B3_VECTORS[n]


def test_blake3_compress_device_lockstep(rng):
    import jax.numpy as jnp

    cv = rng.integers(0, 1 << 32, (6, 8), dtype=np.uint32)
    blk = rng.integers(0, 1 << 32, (6, 16), dtype=np.uint32)
    dev = np.asarray(
        b3_compress_device(jnp.asarray(cv), jnp.asarray(blk),
                           counter_lo=3, flags=1)
    )
    with np.errstate(over="ignore"):
        host = b3_compress(np, cv, blk, 3, 0, 64, 1)
    np.testing.assert_array_equal(dev, host)


def test_sha256_compress_vs_hashlib():
    """One-block message: compress(IV, padded block) == hashlib digest."""
    msg = b"abc"
    padded = bytearray(msg) + b"\x80" + b"\x00" * (64 - len(msg) - 1 - 8)
    padded += (len(msg) * 8).to_bytes(8, "big")
    block = [
        int.from_bytes(padded[4 * i : 4 * i + 4], "big") for i in range(16)
    ]
    out = sha256_compress([int(x) for x in SHA_IV], block)
    digest = b"".join(int(x).to_bytes(4, "big") for x in out)
    assert digest == hashlib.sha256(msg).digest()


def test_sha256_compress_device_lockstep(rng):
    import jax.numpy as jnp

    st = rng.integers(0, 1 << 32, (5, 8), dtype=np.uint32)
    blk = rng.integers(0, 1 << 32, (5, 16), dtype=np.uint32)
    with np.errstate(over="ignore"):
        host = sha_compress(np, st, blk)
    dev = np.asarray(sha_compress(jnp, jnp.asarray(st), jnp.asarray(blk)))
    np.testing.assert_array_equal(dev, host)


def test_rpo_baby_bear_kat():
    """rpo/baby_bear.rs:184 reference vector."""
    from plonky3_tpu.hashes.rescue import rpo_baby_bear

    out = rpo_baby_bear().permute_host(list(range(24)))
    assert out == [
        580889464, 812545993, 1435256485, 1944190928, 468280959,
        1574957037, 614259202, 1971827593, 1157818138, 41725352,
        1454051006, 1975269624, 1052998898, 1151877439, 1238988248,
        973164623, 1378588581, 1290093470, 599149080, 819216820,
        1015689941, 1980884825, 607611746, 918354105,
    ]


def test_rpo_mersenne31_kat():
    """rpo/mersenne_31.rs:332 reference vector."""
    from plonky3_tpu.hashes.rescue import rpo_mersenne31

    out = rpo_mersenne31().permute_host(list(range(24)))
    assert out == [
        1990425063, 95513650, 1492148912, 1455268556, 347571427,
        1892690094, 34080484, 1175631837, 1348619901, 1096114017,
        310913313, 1912324205, 609442899, 2112777835, 1331189849,
        507241525, 1800223977, 568712449, 2123164950, 86025361,
        1585828474, 1334334486, 188486534, 1147991035,
    ]


def test_rpo_goldilocks_kat():
    """rpo/goldilocks.rs:338 vector (interoperable with Miden RPO)."""
    from plonky3_tpu.hashes.rescue import rpo_goldilocks

    out = rpo_goldilocks().permute_host(list(range(12)))
    assert out == [
        15056646954853821376, 594518210294093573, 10395398226526937664,
        3903707756219396109, 7670128982698747483, 4249514323476682720,
        16506822133651532340, 10593868791806571942, 9413309068803954142,
        15946782832277734471, 7904287043744270535, 16548919317472389167,
    ]


# ---------------------------------------------------------------------------
# fast MDS strategies (mds/src/coset_mds.rs:25, karatsuba_convolution.rs)
# ---------------------------------------------------------------------------
def test_coset_mds_matches_dense_and_is_invertible():
    import numpy as np

    from plonky3_tpu.fields import KoalaBear as F
    from plonky3_tpu.hashes.mds import CosetMds

    mds = CosetMds(F=F, width=8)
    rng = np.random.default_rng(0)
    state = [int(v) for v in rng.integers(0, F.P, 8, dtype=np.uint64)]
    # host == dense-matrix path == batched numpy path
    dense = mds._matrix_np()
    want = [
        int(sum(int(dense[i, j]) * state[j] for j in range(8)) % F.P)
        for i in range(8)
    ]
    assert mds.permute_host(state) == want
    got_np = mds.permute_np(np.asarray([state], np.uint64))[0]
    assert [int(x) for x in got_np] == want
    # device path (coset LDE pipeline) in Monty form
    import jax.numpy as jnp

    st_m = jnp.asarray(F.to_monty_np(np.asarray([state], np.uint32)))
    got_dev = F.from_monty_np(np.asarray(mds.permute_device(st_m)))[0]
    assert [int(x) for x in got_dev] == want
    # invertible (hence candidate-MDS): dense determinant != 0 mod P
    m = dense.astype(object) % F.P
    # Gaussian elimination over F
    n = 8
    rank = 0
    m = [list(row) for row in m]
    for col in range(n):
        piv = next(
            (r for r in range(rank, n) if m[r][col] % F.P), None
        )
        if piv is None:
            continue
        m[rank], m[piv] = m[piv], m[rank]
        inv = pow(m[rank][col], F.P - 2, F.P)
        m[rank] = [(v * inv) % F.P for v in m[rank]]
        for r in range(n):
            if r != rank and m[r][col]:
                f = m[r][col]
                m[r] = [
                    (a - f * b) % F.P for a, b in zip(m[r], m[rank])
                ]
        rank += 1
    assert rank == n


def test_karatsuba_circulant_matches_dense():
    import numpy as np

    from plonky3_tpu.fields import KoalaBear as F
    from plonky3_tpu.hashes.mds import (
        CirculantMds,
        karatsuba_circulant_mul,
    )

    rng = np.random.default_rng(1)
    for w in (8, 12, 16, 24, 32):
        first_row = tuple(
            int(v) for v in rng.integers(1, F.P, w, dtype=np.uint64)
        )
        mds = CirculantMds(F=F, first_row=first_row)
        states = rng.integers(0, F.P, (3, w), dtype=np.uint64)
        want = mds.permute_np(states)
        # first COLUMN of M[i][j] = first_row[(j-i) % w] is
        # c[k] = first_row[(-k) % w]
        first_col = [first_row[(-k) % w] for k in range(w)]
        got = karatsuba_circulant_mul(F, first_col, states)
        assert (got == want).all(), w
