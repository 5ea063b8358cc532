"""Multilinear (MLE) kernels — the `multilinear-util` crate analog.

Conventions: a multilinear over n variables is its 2^n evaluations in
natural index order, variable 0 = the LOW index bit (bound first by
sumcheck). eq(r, x) = prod_i (r_i x_i + (1-r_i)(1-x_i)).

The eq table builds as n outer products (eq_batch.rs / split_eq analog):
log-depth device kernels, no scans.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def eq_table_device(E, r_ext):
    """eq(r, x) for all x in {0,1}^n as a device (2^n, D) ext array.

    r_ext: list of ext tuples (host). Index bit i of x = variable i.
    """
    table = jnp.asarray(E.to_monty_np(E.one_h())).reshape(1, E.D)
    # each interleave step makes the CURRENT r the low index bit and
    # shifts earlier ones up, so iterate high-to-low: after the loop,
    # bit i of the index corresponds to r_ext[i] (the sumcheck binds
    # bit 0 first = r_ext[0], matching eq(r, chs) = prod_k eq(r_k, ch_k))
    for r in reversed(r_ext):
        r_m = jnp.asarray(E.to_monty_np(r))
        one_minus = jnp.asarray(
            E.to_monty_np(E.sub_h(E.one_h(), r))
        )
        lo = E.mul(table, one_minus)
        hi = E.mul(table, r_m)
        table = jnp.stack([lo, hi], axis=1).reshape(-1, E.D)
    return table


def eval_mle_host(E, evals_std, r_ext):
    """Evaluate the MLE of `evals_std` (list of base ints, len 2^n) at the
    ext point r (host, exact)."""
    cur = [E.from_base_h(int(v)) for v in evals_std]
    for r in r_ext:
        one_minus = E.sub_h(E.one_h(), r)
        nxt = []
        for i in range(0, len(cur), 2):
            nxt.append(
                E.add_h(
                    E.mul_h(cur[i], one_minus), E.mul_h(cur[i + 1], r)
                )
            )
        cur = nxt
    assert len(cur) == 1
    return cur[0]
