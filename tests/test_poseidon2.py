"""Poseidon2 known-answer tests vs the reference's in-repo KATs
(koala-bear/src/poseidon2.rs:616-658, baby-bear/src/poseidon2.rs:599-638 —
vectors for the default Grain-LFSR constant instances) plus device/host
lockstep."""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky3_tpu.fields import BabyBear, KoalaBear
from plonky3_tpu.hashes.poseidon2 import default_poseidon2

# (field, width) -> (input_std, expected_std)
KATS = {
    ("KoalaBear", 16): (
        [894848333, 1437655012, 1200606629, 1690012884, 71131202, 1749206695,
         1717947831, 120589055, 19776022, 42382981, 1831865506, 724844064,
         171220207, 1299207443, 227047920, 1783754913],
        [1934285469, 604889435, 133449501, 1026180808, 1830659359, 176667110,
         1391183747, 351743874, 1238264085, 1292768839, 2023573270,
         1201586780, 1360691759, 1230682461, 748270449, 651545025],
    ),
    ("KoalaBear", 24): (
        [886409618, 1327899896, 1902407911, 591953491, 648428576, 1844789031,
         1198336108, 355597330, 1799586834, 59617783, 790334801, 1968791836,
         559272107, 31054313, 1042221543, 474748436, 135686258, 263665994,
         1962340735, 1741539604, 2026927696, 449439011, 1131357108, 50869465],
        [382801106, 82839311, 1503190615, 1987418517, 854076995, 1862291425,
         262755189, 1050814217, 722724562, 741265943, 1026879332, 754316749,
         1966025564, 1518878196, 502200188, 1368172258, 845459257, 1711434837,
         724453836, 171032289, 655223446, 1098636135, 407832555, 1707498914],
    ),
    ("BabyBear", 16): (
        [894848333, 1437655012, 1200606629, 1690012884, 71131202, 1749206695,
         1717947831, 120589055, 19776022, 42382981, 1831865506, 724844064,
         171220207, 1299207443, 227047920, 1783754913],
        [516096821, 90309867, 1101817252, 1660784290, 360715097, 1789519026,
         1788910906, 563338433, 319524748, 1741414159, 1650859320, 894311162,
         1121347488, 1692793758, 1052633829, 1344246938],
    ),
    ("BabyBear", 24): (
        [886409618, 1327899896, 1902407911, 591953491, 648428576, 1844789031,
         1198336108, 355597330, 1799586834, 59617783, 790334801, 1968791836,
         559272107, 31054313, 1042221543, 474748436, 135686258, 263665994,
         1962340735, 1741539604, 2026927696, 449439011, 1131357108, 50869465],
        [882297297, 1264077610, 512812497, 782602970, 867738552, 1251075457,
         309180082, 340784773, 524041877, 351272188, 404451680, 15001466,
         322926653, 1773004150, 1718440818, 674682955, 1154713225, 1719133502,
         324232301, 1005243141, 443371079, 268735940, 770060019, 718377682],
    ),
}

FIELDS = {"KoalaBear": KoalaBear, "BabyBear": BabyBear}


@pytest.mark.parametrize("key", list(KATS), ids=lambda k: f"{k[0]}-{k[1]}")
def test_known_answer_host(key):
    F = FIELDS[key[0]]
    inp, want = KATS[key]
    perm = default_poseidon2(F, key[1])
    assert perm.permute_host(inp) == want


@pytest.mark.parametrize("key", list(KATS), ids=lambda k: f"{k[0]}-{k[1]}")
def test_known_answer_device(key):
    F = FIELDS[key[0]]
    inp, want = KATS[key]
    perm = default_poseidon2(F, key[1])
    states = jnp.asarray(
        F.to_monty_np(np.array([inp], dtype=np.uint64))
    )
    out = F.from_monty_np(np.asarray(perm.permute_device(states)))
    np.testing.assert_array_equal(out[0], np.array(want, np.uint32))


@pytest.mark.parametrize("width", [16, 24])
def test_device_host_lockstep_batch(width, rng):
    F = KoalaBear
    perm = default_poseidon2(F, width)
    batch = rng.integers(0, F.P, (32, width), dtype=np.uint64)
    dev = F.from_monty_np(
        np.asarray(perm.permute_device(jnp.asarray(F.to_monty_np(batch))))
    )
    for i in range(32):
        host = perm.permute_host([int(x) for x in batch[i]])
        np.testing.assert_array_equal(dev[i], np.array(host, np.uint32))


def test_permutation_is_bijective_on_samples(rng):
    """Distinct inputs map to distinct outputs (sanity, not a proof)."""
    F = KoalaBear
    perm = default_poseidon2(F, 16)
    batch = rng.integers(0, F.P, (64, 16), dtype=np.uint64)
    out = np.asarray(perm.permute_device(jnp.asarray(F.to_monty_np(batch))))
    assert len({bytes(r.tobytes()) for r in out}) == 64


@pytest.mark.parametrize("field,width", [
    (KoalaBear, 16), (KoalaBear, 24), (BabyBear, 16), (BabyBear, 24),
])
def test_native_host_lockstep(field, width, rng):
    """The C kernel (native/poseidon2.c, routed through permute_host)
    must match the pure-Python exact permutation on random states. When
    the native toolchain is absent both paths are the Python one and
    the test degenerates to a self-check."""
    perm = default_poseidon2(field, width)
    for _ in range(8):
        state = [int(x) for x in
                 rng.integers(0, field.P, width, dtype=np.uint64)]
        assert perm.permute_host(state) == perm.permute_host_py(state)


def test_native_duplex_chain_matches_elementwise(rng):
    """DuplexChallenger.observe_base_array (native C full-block chain)
    must leave the challenger in the same state as element-by-element
    observe, across head/tail partial-block alignments."""
    from plonky3_tpu.challenger.duplex import DuplexChallenger

    F = KoalaBear
    perm = default_poseidon2(F, 24)
    for n, prefill in [(16, 0), (53, 0), (64, 5), (15, 3), (160, 16)]:
        vals = rng.integers(0, F.P, n, dtype=np.uint64)
        a = DuplexChallenger(perm, rate=16)
        b = DuplexChallenger(perm, rate=16)
        for c in (a, b):
            c.observe_many(range(1, prefill + 1))
        a.observe_base_array(vals)
        for v in vals.tolist():
            b.observe(int(v))
        assert a.state == b.state
        assert a.input_buffer == b.input_buffer
        assert a.output_buffer == b.output_buffer
        assert a.sample_ext(4) == b.sample_ext(4)
