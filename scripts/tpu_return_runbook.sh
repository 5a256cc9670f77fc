#!/bin/bash
# Run this the moment the TPU tunnel returns (see /tmp/tpu_status watcher).
# Serializes the TPU jobs (one chip); logs land in /tmp/tpu_runbook/.
# NEVER run while CPU-heavy jobs (pytest) are active — host contention
# halves measured FPS (PERF_NOTES.md).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/tpu_runbook
cd /root/repo

echo "=== 1/5 backend probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

echo "=== 2/5 bench cold run #1 (populates the compilation cache if axon executables serialize)"
timeout 3000 python bench.py 2>/tmp/tpu_runbook/bench1.err | tee /tmp/tpu_runbook/bench1.json

echo "=== cache state after run 1"
ls ~/.cache/devo_tpu_xla 2>/dev/null | wc -l; du -sh ~/.cache/devo_tpu_xla 2>/dev/null

echo "=== 3/5 bench cold run #2 (reproducibility: must be within 10% of #1; much faster to warm if the cache serialized)"
timeout 3000 python bench.py 2>/tmp/tpu_runbook/bench2.err | tee /tmp/tpu_runbook/bench2.json

echo "=== 4/5 Pallas banded kernel golden vs XLA on the real chip"
timeout 1200 python scripts/bench_pallas2.py 2>&1 | tail -20 | tee /tmp/tpu_runbook/pallas.log

echo "=== 5/5 device profile of the engine step (per-op table)"
timeout 1800 python scripts/profile_step.py 2>&1 | tail -40 | tee /tmp/tpu_runbook/profile.log

echo "=== runbook done; decide next optimization from the profile table"
