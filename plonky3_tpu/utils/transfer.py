"""Device->host transfer batching.

Every device->host pull through the axon tunnel costs a ~30 ms round
trip regardless of size, so the prover batches all pending pulls of a
phase into ONE concatenated fetch."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pull_all(arrays):
    """Fetch a list of device arrays with a single round-trip.

    Returns host numpy arrays with the original shapes."""
    arrays = list(arrays)
    if not arrays:
        return []
    if len(arrays) == 1:
        return [np.asarray(arrays[0])]
    flat = np.asarray(jnp.concatenate([a.ravel() for a in arrays]))
    out, off = [], 0
    for a in arrays:
        cnt = int(np.prod(a.shape, dtype=np.int64))
        out.append(flat[off : off + cnt].reshape(a.shape))
        off += cnt
    return out
