#!/bin/bash
# round-5f: round-end record — ONE pure-defaults confirm bench after the
# last adoption flip (defaults == last-measured-as-defaults, the r4
# discipline), then the in-context per-stage table regen for PROFILE.md.
cd "$(dirname "$0")/.."
if [ -f /tmp/r5e.pid ]; then
  while kill -0 "$(cat /tmp/r5e.pid)" 2>/dev/null; do sleep 20; done
fi
LOG=queue_results.log
run() {
  echo "=== $1 — $(date -u)" | tee -a "$LOG"
  shift
  bash probes/run_tpu.sh "$@" 2>&1 | tail -14 | tee -a "$LOG"
}
run "R5F-1. defaults confirm bench (post all r5 adoptions)" 2700 \
    python bench.py
echo "=== R5F-2. perfprobe2 per-stage regen (full log: perfprobe2_r5.log) — $(date -u)" \
  | tee -a "$LOG"
bash probes/run_tpu.sh 3600 python -u -m fldrx.tools.perfprobe2 \
  2>&1 | tee perfprobe2_r5.log | tail -20 | tee -a "$LOG"
echo "=== R5F batch done — $(date -u)" | tee -a "$LOG"
