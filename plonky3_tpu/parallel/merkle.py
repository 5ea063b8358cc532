"""Sharded Merkle commit: per-device subtrees + replicated cap.

SURVEY.md §7.5: each device owns a contiguous row shard = one subtree;
the leaf layer and the first (log_h - log_d) compression levels are
embarrassingly parallel per shard; the per-shard subtree roots are
all-gathered (one tiny collective) and every device finishes the top
log_d levels locally (deterministic, replicated) — the layer-wise
collective-reduce analog of `merkle_tree.rs:95`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..utils.bits import log2_strict


@partial(jax.jit, static_argnames=("mmcs", "mesh", "axis"))
def sharded_tree_layers(mmcs, mat, mesh, axis="sp"):
    """Build all digest layers of a single row-sharded matrix.

    Returns the layer list (leaves first). Layers down to the per-shard
    subtree roots stay row-sharded; the top log_d levels are replicated.
    """
    h = mat.shape[0]
    log_h = log2_strict(h)
    ndev = mesh.shape[axis]
    log_d = log2_strict(ndev)
    assert log_h > log_d, "need at least 2 rows per shard"

    def constrain(v):
        return jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, P(axis, None))
        )

    layer = mmcs.sponge.hash_rows_device([constrain(mat)])
    layers = [constrain(layer)]
    hh = h
    while hh > ndev:
        hh //= 2
        pairs = layers[-1].reshape(hh, 2, -1)
        layer = mmcs.compressor.compress_device(pairs[:, 0], pairs[:, 1])
        if hh >= ndev:
            layer = constrain(layer)
        layers.append(layer)
    # top of the tree: all-gathered subtree roots, replicated finish
    while hh > 1:
        hh //= 2
        rep = jax.lax.with_sharding_constraint(
            layers[-1], NamedSharding(mesh, P(None, None))
        )
        pairs = rep.reshape(hh, 2, -1)
        layers.append(
            mmcs.compressor.compress_device(pairs[:, 0], pairs[:, 1])
        )
    return layers
