from .monty31 import Monty31
from .extension import BinomialExtension
from .params import (
    KoalaBear,
    BabyBear,
    KOALABEAR_EXT4,
    KOALABEAR_EXT8,
    BABYBEAR_EXT4,
    BABYBEAR_EXT8,
)

KoalaBearExt4 = BinomialExtension(base=KoalaBear, **KOALABEAR_EXT4)
KoalaBearExt8 = BinomialExtension(base=KoalaBear, **KOALABEAR_EXT8)
BabyBearExt4 = BinomialExtension(base=BabyBear, **BABYBEAR_EXT4)
BabyBearExt8 = BinomialExtension(base=BabyBear, **BABYBEAR_EXT8)

__all__ = [
    "Monty31",
    "BinomialExtension",
    "KoalaBear",
    "BabyBear",
    "KoalaBearExt4",
    "KoalaBearExt8",
    "BabyBearExt4",
    "BabyBearExt8",
]
