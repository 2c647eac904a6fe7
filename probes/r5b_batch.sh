#!/bin/bash
# round-5b: flow-stage structural gates + the conv kernel decision matrix.
# Waits for the r5a batch (priority measurements) to release the chip.
# Reordered mid-round: the cheap decomposition probes (blend, conv) run
# FIRST because their results unblock this round's structural work; the
# T_CHUNK re-sweep moved to the r5c tail (lowest expected value).
#   0. blendprobe           — decompose the 14 ms blend (VERDICT item 3)
#   1. convprobe            — CONV_ALIGN {8,16} x CONV_KX {kernel,xla}
#                             (the r4 run died on a relay flake mid-matrix)
#   1b. convprobe CONV_FORM=kcat — lane-concat ky contraction (cfcb5ab)
#   2. bench RESIZE_PREC=high   — 3-pass resize matmuls (vs HIGHEST's 6)
#   3. bench PYR_CASCADE=1      — cascade pyramid (level i from level i-1)
#   4. bench both composed
#   5-6. goldenclip deploy gates for each (quality budget: 0.05 dB)
cd "$(dirname "$0")/.."
if [ -f /tmp/r5a.pid ]; then
  while kill -0 "$(cat /tmp/r5a.pid)" 2>/dev/null; do sleep 30; done
fi
LOG=queue_results.log
run() {
  echo "=== $1 — $(date -u)" | tee -a "$LOG"
  shift
  bash probes/run_tpu.sh "$@" 2>&1 | tail -14 | tee -a "$LOG"
}
run "R5B-0. blendprobe decomposition" 2400 python -u probes/blendprobe.py
run "R5B-0b. blendprobe HLO op census" 1200 \
    python -u probes/blendprobe.py --hlo
run "R5B-1. convprobe ALIGN x KX matrix" 3600 python -u probes/convprobe.py
run "R5B-1b. convprobe CONV_FORM=kcat" 3600 \
    env FLDRX_CONV_FORM=kcat python -u probes/convprobe.py
run "R5B-2. bench RESIZE_PREC=high" 2700 \
    env FLDRX_RESIZE_PREC=high python bench.py
run "R5B-3. bench PYR_CASCADE=1" 2700 \
    env FLDRX_PYR_CASCADE=1 python bench.py
run "R5B-4. bench RESIZE_PREC=high + PYR_CASCADE=1" 2700 \
    env FLDRX_RESIZE_PREC=high FLDRX_PYR_CASCADE=1 python bench.py
run "R5B-5. goldenclip deploy RESIZE_PREC=high" 3600 \
    env FLDRX_GOLDEN_CONFIGS=deploy FLDRX_RESIZE_PREC=high \
    python -u -m fldrx.tools.goldenclip_report
run "R5B-6. goldenclip deploy PYR_CASCADE=1" 3600 \
    env FLDRX_GOLDEN_CONFIGS=deploy FLDRX_PYR_CASCADE=1 \
    python -u -m fldrx.tools.goldenclip_report
echo "=== R5B batch done — $(date -u)" | tee -a "$LOG"
