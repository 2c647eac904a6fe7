#!/bin/bash
# round-4h: resume the interrupted R4F batch (died after R4F-2) and fold in
# the R4G follow-ups. Ordered by decision value:
#   1. bench LEVEL_SPLAT=exact           (flowprobe favoured it 192.8 vs 205)
#   2. bench WIDE_RESIZE=0               (flowprobe favoured naive einsum 192.2)
#   3. bench WIDE_RESIZE=0 + LEVEL_SPLAT=exact (composed)
#   4. defaults bench (ABAB control)
#   5. trainprobe B=8 512^2              (VERDICT r3 weak #6)
#   6. evalprobe EVAL_DEFER A/B          (pair overlap, VERDICT r3 item 3)
#   7. convprobe CONV_KX kernel/xla
#   8. perfprobe2 per-stage regen
# Appends to queue_results.log; serialized (one chip).
cd "$(dirname "$0")/.."
LOG=queue_results.log
run() {
  echo "=== $1 — $(date -u)" | tee -a "$LOG"
  shift
  bash probes/run_tpu.sh "$@" 2>&1 | tail -12 | tee -a "$LOG"
}
run "R4H-1. bench LEVEL_SPLAT=exact" 2700 \
    env FLDRX_LEVEL_SPLAT=exact python bench.py
run "R4H-2. bench WIDE_RESIZE=0" 2700 \
    env FLDRX_WIDE_RESIZE=0 python bench.py
run "R4H-3. bench WIDE_RESIZE=0 + LEVEL_SPLAT=exact" 2700 \
    env FLDRX_WIDE_RESIZE=0 FLDRX_LEVEL_SPLAT=exact python bench.py
run "R4H-4. defaults bench (ABAB control)" 1800 python bench.py
echo "=== R4H-5. trainprobe B=8 512^2 — $(date -u)" | tee -a "$LOG"
bash probes/run_tpu.sh 5400 python -u probes/trainprobe.py > /tmp/trainprobe.out 2>&1
echo "trainprobe rc=$? (full log /tmp/trainprobe.out)" | tee -a "$LOG"
tail -6 /tmp/trainprobe.out | tee -a "$LOG"
run "R4H-6. evalprobe EVAL_DEFER A/B (2 scenes)" 7200 python -u probes/evalprobe.py 2
run "R4H-7. convprobe CONV_KX kernel/xla" 2400 python -u probes/convprobe.py
run "R4H-8. perfprobe2 per-stage regen" 5400 python -u -m fldrx.tools.perfprobe2
echo "=== R4H batch done — $(date -u)" | tee -a "$LOG"
