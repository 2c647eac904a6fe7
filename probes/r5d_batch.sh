#!/bin/bash
# round-5d (manual sequencing after the r5c wrapper was stopped): the
# remaining decision data before the adoption flips —
#   1. goldenclip deploy SPLAT_YWIN=1   (the YWIN quality gate, ex-R5C-4)
#   2. defaults bench                    (clean post-conv/resize-adoption
#                                         baseline for ZH/YWIN attribution)
# The final confirm bench + goldenclip + trainrun run after the flips.
cd "$(dirname "$0")/.."
# wait for the orphaned R5C-3 goldenclip pipeline (known pid, passed as
# $1) to release the chip
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
LOG=queue_results.log
run() {
  echo "=== $1 — $(date -u)" | tee -a "$LOG"
  shift
  bash probes/run_tpu.sh "$@" 2>&1 | tail -14 | tee -a "$LOG"
}
run "R5D-1. goldenclip deploy SPLAT_YWIN=1" 2700 \
    env FLDRX_GOLDEN_CONFIGS=deploy FLDRX_SPLAT_YWIN=1 \
    python -u -m fldrx.tools.goldenclip_report
run "R5D-2. defaults bench (post conv/resize adoption)" 2700 python bench.py
echo "=== R5D batch done — $(date -u)" | tee -a "$LOG"
