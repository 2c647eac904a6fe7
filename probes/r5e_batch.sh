#!/bin/bash
# round-5e: the YWIN adopt-or-delete A/B against the post-adoption
# defaults (R5D-2 is the A side), then the hardware-training evidence run
# (VERDICT r4 item 8) with FULL output captured (the tail-14 pipe has
# eaten two probe runs' partials this round).
cd "$(dirname "$0")/.."
if [ -f /tmp/r5d.pid ]; then
  while kill -0 "$(cat /tmp/r5d.pid)" 2>/dev/null; do sleep 20; done
fi
LOG=queue_results.log
run() {
  echo "=== $1 — $(date -u)" | tee -a "$LOG"
  shift
  bash probes/run_tpu.sh "$@" 2>&1 | tail -14 | tee -a "$LOG"
}
run "R5E-1. bench SPLAT_YWIN=1 (B side; A = R5D-2 defaults)" 2700 \
    env FLDRX_SPLAT_YWIN=1 python bench.py
echo "=== R5E-2. trainrun 18+2 epochs (full log: trainrun_r5.log) — $(date -u)" \
  | tee -a "$LOG"
bash probes/run_tpu.sh 7200 python -u probes/trainrun.py 18 2 \
  2>&1 | tee trainrun_r5.log | tail -25 | tee -a "$LOG"
echo "=== R5E batch done — $(date -u)" | tee -a "$LOG"
