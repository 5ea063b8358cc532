#!/bin/bash
# Run python on CPU, bypassing the axon TPU backend claim (see
# .claude/skills/verify: the sitecustomize registers axon in EVERY process).
export JAX_PLATFORMS=cpu
exec python "$@"
