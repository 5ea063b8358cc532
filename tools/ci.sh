#!/bin/sh
# CI entry: the ENTIRE test suite in one pytest process (the invocation
# VERDICT round-2 #2 demands). Slow proofs (-m slow) run when CI_SLOW=1.
# Last recorded clean runs:
#   2026-08-18  300 passed, exit 0, 6580 s (1 vCPU, contended)
set -e
cd "$(dirname "$0")/.."
# MUST be exported before the interpreter starts: the ambient axon
# sitecustomize reads it at startup; a post-import override costs ~5x
# (see tests/conftest.py).
export JAX_PLATFORMS=cpu
if [ "${CI_SLOW:-0}" = "1" ]; then
  exec python -m pytest tests/ -q -p no:cacheprovider -m ""
fi
exec python -m pytest tests/ -q -p no:cacheprovider
