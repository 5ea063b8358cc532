"""Poseidon1 / Rescue-RPO / Monolith / MDS: reference KATs + lockstep.

Vectors are the reference's own test vectors
(koala-bear/src/poseidon1.rs:535,552; rescue/src/rpo/koala_bear.rs:182;
monolith/src/monolith.rs:209).
"""

import numpy as np
import pytest

from plonky3_tpu.fields.params import BabyBear, KoalaBear
from plonky3_tpu.hashes.mds import CirculantMds
from plonky3_tpu.hashes.monolith import MonolithM31
from plonky3_tpu.hashes.poseidon1 import default_poseidon1
from plonky3_tpu.hashes.rescue import RpoKoalaBear

P1_KAT_16 = [
    610090613, 935319874, 1893335292, 796792199, 356405232, 552237741,
    55134556, 1215104204, 1823723405, 1133298033, 1780633798, 1453946561,
    710069176, 1128629550, 1917333254, 1175481618,
]
P1_KAT_24 = [
    511672087, 215882318, 237782537, 740528428, 712760904, 54615367,
    751514671, 110231969, 1905276435, 992525666, 918312360, 18628693,
    749929200, 1916418953, 691276896, 1112901727, 1163558623, 882867603,
    673396520, 1480278156, 1402044758, 1693467175, 1766273044, 433841551,
]
RPO_KAT = [
    1407896285, 1062342513, 1822322044, 864303338, 510786778, 1251794877,
    757025745, 547176545, 675022842, 1465657099, 1078871545, 1998725156,
    1434537809, 1874670136, 1612157256, 891444931, 965969718, 275772368,
    221105388, 770314268, 912214035, 63895892, 1738877181, 1622784127,
]
MONOLITH_KAT = [
    609156607, 290107110, 1900746598, 1734707571, 2050994835, 1648553244,
    1307647296, 1941164548, 1707113065, 1477714255, 1170160793, 93800695,
    769879348, 375548503, 1989726444, 1349325635,
]


@pytest.mark.parametrize(
    "width,kat", [(16, P1_KAT_16), (24, P1_KAT_24)]
)
def test_poseidon1_koalabear_kat(width, kat):
    p = default_poseidon1(KoalaBear, width)
    assert p.permute_host(list(range(width))) == kat


def test_poseidon1_device_np_lockstep(rng):
    import jax.numpy as jnp

    F = KoalaBear
    p = default_poseidon1(F, 16)
    x = F.rand_np(rng, (4, 16))
    dev = np.asarray(p.permute_device(jnp.asarray(x)))
    hnp = p.permute_np(x)
    np.testing.assert_array_equal(dev, hnp)
    std = F.from_monty_np(x)
    host = p.permute_host([int(v) for v in std[1]])
    assert [int(v) for v in F.from_monty_np(dev[1])] == host


def test_poseidon1_babybear_runs():
    p = default_poseidon1(BabyBear, 16)
    out = p.permute_host(list(range(16)))
    assert len(out) == 16 and all(0 <= x < BabyBear.P for x in out)


def test_rpo_koalabear_kat():
    rpo = RpoKoalaBear(KoalaBear)
    assert rpo.permute_host(list(range(24))) == RPO_KAT
    npo = rpo.permute_np(np.array([list(range(24))], dtype=np.uint32))
    assert [int(x) for x in npo[0]] == RPO_KAT


def test_monolith_m31_kat():
    m = MonolithM31()
    assert m.permute_host(list(range(16))) == MONOLITH_KAT
    npo = m.permute_np(np.array([list(range(16))] * 3, dtype=np.uint32))
    assert [int(x) for x in npo[2]] == MONOLITH_KAT


def test_circulant_mds_paths_agree(rng):
    import jax.numpy as jnp

    from plonky3_tpu.hashes.constants.poseidon1_constants import (
        KOALABEAR_MDS_FIRST_ROW_16,
    )

    F = KoalaBear
    mds = CirculantMds(F, KOALABEAR_MDS_FIRST_ROW_16)
    x = F.rand_np(rng, (3, 16))
    dev = np.asarray(mds.permute_device(jnp.asarray(x)))
    std = F.from_monty_np(x)
    hnp = mds.permute_np(std)
    np.testing.assert_array_equal(F.from_monty_np(dev), hnp)
    host = mds.permute_host([int(v) for v in std[0]])
    assert [int(v) for v in hnp[0]] == host


def test_monolith_goldilocks_width12_kat():
    """HorizenLabs Monolith-64 reference vector
    (monolith/src/monolith.rs:304-336, LOOKUP_BITS=8)."""
    from plonky3_tpu.hashes.monolith import MonolithGoldilocks

    out = MonolithGoldilocks(width=12).permute_host(list(range(12)))
    assert out == [
        5867581605548782913, 588867029099903233, 6043817495575026667,
        805786589926590032, 9919982299747097782, 6718641691835914685,
        7951881005429661950, 15453177927755089358, 974633365445157727,
        9654662171963364206, 6281307445101925412, 13745376999934453119,
    ]


def test_monolith_goldilocks_width8_deterministic():
    from plonky3_tpu.hashes.monolith import MonolithGoldilocks

    m = MonolithGoldilocks(width=8)
    a = m.permute_host(list(range(8)))
    b = m.permute_host(list(range(8)))
    assert a == b
    assert a != list(range(8))
    P = (1 << 64) - (1 << 32) + 1
    assert all(0 <= x < P for x in a)
