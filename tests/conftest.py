"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Mirrors the reference's CI strategy (SURVEY.md §4: scalar/SIMD × serial/
parallel matrix): here, all tests run on CPU with 8 virtual devices so
sharding paths are exercised without TPU hardware.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (one shared TPU
# chip). Tests must run on the 8-device virtual CPU mesh.
#
# FAST PATH: when the invoker already exported JAX_PLATFORMS=cpu before the
# interpreter started (tools/ci.sh does), the ambient sitecustomize saw it
# and nothing needs patching. Calling jax.config.update("jax_platforms")
# post-import instead routes EVERY primitive dispatch through the axon
# register's uncached-backend shim (~75 ms per eager op, 7x slower
# compiles) — so only fall back to the config override when the env came
# in pointing at the axon chip.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# ALWAYS force cpu + drop the axon backend factory: the sitecustomize's
# axon.register() CLOBBERS an exported JAX_PLATFORMS=cpu (discovered
# 2026-08-19 — the former "fast path" that trusted the env var silently
# ran the whole suite on the shared TPU chip through the tunnel).
jax.config.update("jax_platforms", "cpu")
try:
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags

# Persistent compile cache: the heavyweight jitted programs (fused NTT
# bodies, Merkle tree builds, quotient passes — the GL limb-pair DIF
# alone costs minutes of XLA:CPU compile at some shapes) compile ONCE
# ever per shape; later CI runs hit the disk cache.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)


@pytest.fixture(autouse=True, scope="module")
def _bounded_jax_state():
    """Clear jax's compiled-executable caches after every test module.

    One long pytest process accumulates thousands of compiled XLA CPU
    executables across ~40 test files; around executable ~10^3 the XLA
    CPU compiler segfaults inside backend_compile_and_load (observed at
    ~24% of the suite, reproducibly, with 126 GB RAM free — compiler
    state, not memory pressure). Dropping the caches between modules
    keeps the live-executable count bounded and the suite green in one
    invocation."""
    yield
    import jax

    jax.clear_caches()
