#!/bin/bash
# Run this the moment the TPU tunnel returns (see /tmp/tpu_status watcher).
# Serializes the TPU jobs (one chip); logs land in /tmp/tpu_runbook/.
# NEVER run while CPU-heavy jobs (pytest) are active — host contention
# halves measured FPS (PERF_NOTES.md). Every stage is bounded by timeout
# so a tunnel wedge (threads parked in futex/epoll, observed 2026-08-19)
# costs minutes, not the session.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/tpu_runbook
cd /root/repo

echo "=== 1/4 backend probe"
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

echo "=== 2/4 A/B bench matrix (ring i8/bf16 x wire i8/f16) — each run's"
echo "    JSON logs resolved config, per-window bucket caps, live edges,"
echo "    and uploader queue-wait, so any FPS delta is attributable from"
echo "    the artifacts alone"
scripts/bench_ab.sh /tmp/tpu_runbook/ab

echo "=== cache serialization check (expect jit_step entries ~25 MB;"
echo "    VERIFIED 2026-08-19 — if the count did not grow, the remote-"
echo "    compile path regressed)"
ls ~/.cache/devo_tpu_xla 2>/dev/null | wc -l; du -sh ~/.cache/devo_tpu_xla 2>/dev/null

echo "=== 3/4 Pallas banded kernel golden vs XLA on the real chip"
timeout 1200 python scripts/bench_pallas2.py 2>&1 | tail -20 | tee /tmp/tpu_runbook/pallas.log

echo "=== 4/4 device profile of the engine step (per-op table)"
timeout 1800 python scripts/profile_step.py 2>&1 | tail -40 | tee /tmp/tpu_runbook/profile.log

echo "=== runbook done; pick the fastest A/B config as the default and"
echo "    decide the next optimization from the profile table"
