"""Run a python script/module on CPU jax, dodging the axon TPU claim.

Usage: python tools/cpurun.py script.py [args...]
The ambient sitecustomize (PYTHONPATH=/root/.axon_site) imports jax and
registers the axon backend in every process; claiming the remote chip
costs 40s-4min. This forces the CPU backend the same way tests/conftest.py
does, then execs the target script.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
try:
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

sys.path.insert(0, "/root/repo")
sys.argv = sys.argv[1:]
path = sys.argv[0]
exec(compile(open(path).read(), path, "exec"), {"__name__": "__main__"})
