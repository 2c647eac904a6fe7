#!/bin/bash
# round-4g: follow-ups from R4F's flowprobe (WIDE_RESIZE=1 measured SLOWER
# at the flow stage, LEVEL_SPLAT=exact faster — end-to-end deciders), plus
# the per-stage table regen. Waits for the R4F batch to release the chip.
cd "$(dirname "$0")/.."
LOG=queue_results.log
while ! grep -q "R4F batch done" "$LOG" 2>/dev/null; do sleep 120; done
run() {
  echo "=== $1 — $(date -u)" | tee -a "$LOG"
  shift
  bash probes/run_tpu.sh "$@" 2>&1 | tail -12 | tee -a "$LOG"
}
run "R4G-1. bench WIDE_RESIZE=0" 2700 \
    env FLDRX_WIDE_RESIZE=0 python bench.py
run "R4G-2. bench WIDE_RESIZE=0 + LEVEL_SPLAT=exact" 2700 \
    env FLDRX_WIDE_RESIZE=0 FLDRX_LEVEL_SPLAT=exact python bench.py
run "R4G-3. defaults bench (ABAB control)" 1800 python bench.py
run "R4G-4. perfprobe2 per-stage regen" 5400 \
    python -u -m fldrx.tools.perfprobe2
echo "=== R4G batch done — $(date -u)" | tee -a "$LOG"
