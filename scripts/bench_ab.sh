#!/bin/bash
# A/B bench matrix for perf triage (VERDICT r02 next-steps #1/#2):
# corr-ring dtype x host->device wire format. Each run writes its own JSON
# (bench.py logs the resolved config + per-window bucket caps, live-edge
# counts, and uploader queue-wait, so any FPS delta is attributable from
# the artifacts alone). NEVER run while CPU-heavy jobs (pytest) are active
# — host contention halves measured FPS (PERF_NOTES.md).
#
# Usage: scripts/bench_ab.sh [outdir]   (default /tmp/bench_ab)
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-/tmp/bench_ab}
mkdir -p "$OUT"
cd /root/repo

timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "backend probe failed (tunnel down?)"; exit 1; }

run() {
  ring=$1; wire=$2; tag="ring${ring}_${wire}"
  echo "=== bench $tag ($(date +%H:%M:%S))"
  BENCH_RING_I8=$ring BENCH_WIRE=$wire timeout 3000 \
    python bench.py 2>"$OUT/$tag.err" | tee "$OUT/$tag.json"
}

# shipped r02 default first (reproduce the driver's 8.97), then the r01
# configuration, then the two crosses to attribute ring-vs-wire
run 1 i8
run 0 f16
run 0 i8
run 1 f16

echo "=== cache state: $(ls ~/.cache/devo_tpu_xla | wc -l) entries, $(du -sh ~/.cache/devo_tpu_xla | cut -f1)"
echo "=== summary"
for f in "$OUT"/*.json; do echo "$f: $(cat "$f")"; done
