#!/bin/bash
# round-4c: flat-wide resize A/B + device gate. Waits for r4b to finish
# (the chip is serialized), then measures. Appends to queue_results.log.
cd "$(dirname "$0")/.."
LOG=queue_results.log
while ! grep -q "R4B batch done" "$LOG" 2>/dev/null; do sleep 60; done
run() {
  echo "=== $1 — $(date -u)" | tee -a "$LOG"
  shift
  bash probes/run_tpu.sh "$@" 2>&1 | tail -12 | tee -a "$LOG"
}
run "R4C-1. bench WIDE_RESIZE=0 (naive einsums)" 2400 \
    env FLDRX_WIDE_RESIZE=0 python bench.py
run "R4C-2. bench WIDE_RESIZE=1 (flat-wide)" 2400 \
    env FLDRX_WIDE_RESIZE=1 python bench.py
run "R4C-3. goldengate wide A/B bitwise check (4K)" 5400 \
    python -u probes/goldengate.py
echo "=== R4C batch done — $(date -u)" | tee -a "$LOG"
