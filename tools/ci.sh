#!/bin/sh
# CI entry: the ENTIRE test suite in one pytest process (the invocation
# VERDICT round-2 #2 demands). Slow proofs (-m slow) run when CI_SLOW=1.
# Last recorded clean runs:
#   2026-08-18  300 passed, exit 0, 6580 s (1 vCPU, contended)
set -e
cd "$(dirname "$0")/.."
# NOTE: the ambient axon sitecustomize CLOBBERS JAX_PLATFORMS; the
# conftest force-switches to cpu and drops the axon backend factory
# post-import (tests/conftest.py). The export is belt-and-braces only.
export JAX_PLATFORMS=cpu
if [ "${CI_SLOW:-0}" = "1" ]; then
  exec python -m pytest tests/ -q -p no:cacheprovider -m ""
fi
exec python -m pytest tests/ -q -p no:cacheprovider
