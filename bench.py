"""Headline benchmark — prints ONE JSON line for the driver.

Current metric: KoalaBear coset-LDE (blowup 2) + Poseidon2-24/16/8 Merkle
commit throughput (BASELINE.md config #2), measured on the real chip.
`vs_baseline` is null: the reference publishes no absolute numbers
(BASELINE.md "Published numbers"); the recorded value is the absolute
number to track round over round.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from plonky3_tpu.fields.params import KoalaBear as F
    from plonky3_tpu.hashes.poseidon2 import default_poseidon2
    from plonky3_tpu.hashes.sponge import PaddingFreeSponge, TruncatedPermutation
    from plonky3_tpu.ops.ntt import coset_lde_batch

    sponge = PaddingFreeSponge(default_poseidon2(F, 24), rate=16, out=8)
    compressor = TruncatedPermutation(default_poseidon2(F, 16), chunk=8)

    LOG_N, WIDTH = 16, 64

    def step(trace):
        lde = coset_lde_batch(F, trace, 1, F.GENERATOR)
        layer = sponge.hash_rows_device([lde])
        while layer.shape[0] > 1:
            h = layer.shape[0] // 2
            pairs = layer.reshape(h, 2, 8)
            layer = compressor.compress_device(pairs[:, 0], pairs[:, 1])
        return layer[0]

    fn = jax.jit(step)
    rng = np.random.default_rng(1)
    trace = rng.integers(0, F.P, size=(1 << LOG_N, WIDTH), dtype=np.uint32)
    trace = jax.device_put(trace)

    jax.block_until_ready(fn(trace))  # compile
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        jax.block_until_ready(fn(trace))
    dt = (time.perf_counter() - t0) / n_iter

    cells = (1 << (LOG_N + 1)) * WIDTH  # LDE output cells hashed+committed
    print(json.dumps({
        "metric": f"lde2x_merkle_commit_2^{LOG_N}x{WIDTH}_koalabear",
        "value": round(cells / dt / 1e6, 2),
        "unit": "Mcells/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
