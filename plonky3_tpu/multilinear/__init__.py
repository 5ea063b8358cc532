from .mle import eq_table_device, eval_mle_host
from .sumcheck import SumcheckProof, prove_zerocheck, verify_zerocheck

__all__ = [
    "eq_table_device",
    "eval_mle_host",
    "SumcheckProof",
    "prove_zerocheck",
    "verify_zerocheck",
]
