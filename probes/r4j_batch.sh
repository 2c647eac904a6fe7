#!/bin/bash
# round-4j: pair-batched throughput (FLDRX_BENCH_PAIRS) — B independent 4K
# pairs ride one program; coarse-grid ops and per-launch overheads amortize.
# CPU-smoke-tested B=2 end-to-end (batch-global PCA minmax noted; a per-item
# minmax switch is the production follow-up if this wins).
#   1. PAIRS=2 T_CHUNK=2   (4 frame-problems/launch — same live set as
#                           today's B=1 chunk-4 defaults)
#   2. PAIRS=2 T_CHUNK=4   (8/launch; memory risk — OOM is informative)
#   3. PAIRS=2 T_CHUNK=2 + OVERLAP=1 (composed with dispatch-ahead)
# Appends to queue_results.log; waits for the r4i batch to release the chip.
cd "$(dirname "$0")/.."
if [ -f /tmp/r4i.pid ]; then
  while kill -0 "$(cat /tmp/r4i.pid)" 2>/dev/null; do sleep 30; done
fi
LOG=queue_results.log
run() {
  echo "=== $1 — $(date -u)" | tee -a "$LOG"
  shift
  bash probes/run_tpu.sh "$@" 2>&1 | tail -12 | tee -a "$LOG"
}
run "R4J-1. bench PAIRS=2 T_CHUNK=2" 3600 \
    env FLDRX_BENCH_PAIRS=2 FLDRX_BENCH_T_CHUNK=2 python bench.py
run "R4J-2. bench PAIRS=2 T_CHUNK=4" 3600 \
    env FLDRX_BENCH_PAIRS=2 FLDRX_BENCH_T_CHUNK=4 python bench.py
run "R4J-3. bench PAIRS=2 T_CHUNK=2 OVERLAP=1" 2700 \
    env FLDRX_BENCH_PAIRS=2 FLDRX_BENCH_T_CHUNK=2 FLDRX_BENCH_OVERLAP=1 python bench.py
echo "=== R4J batch done — $(date -u)" | tee -a "$LOG"
