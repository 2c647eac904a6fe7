#!/bin/bash
# round-4f measurement batch (after the 529-outage gap):
#   1. defaults bench confirm (t_chunk=4 default; expect ~4.70)
#   2. flowprobe: WIDE_RESIZE / LEVEL_SPLAT gates on the flow stage
#   3. convprobe: FLDRX_CONV_KX kernel/xla A/B on the UNet convs
#   4. end-to-end bench with LEVEL_SPLAT=exact (if flowprobe favours it)
#   5. trainprobe (VERDICT r3 weak #6 — full output to /tmp/trainprobe.out)
#   6. evalprobe EVAL_DEFER A/B (pair overlap, VERDICT r3 item 3)
# Appends to queue_results.log; serialized (one chip).
cd "$(dirname "$0")/.."
LOG=queue_results.log
run() {
  echo "=== $1 — $(date -u)" | tee -a "$LOG"
  shift
  bash probes/run_tpu.sh "$@" 2>&1 | tail -12 | tee -a "$LOG"
}
run "R4F-1. defaults bench confirm" 1800 python bench.py
run "R4F-2. flowprobe WIDE_RESIZE/LEVEL_SPLAT" 2700 python -u probes/flowprobe.py
run "R4F-3. convprobe CONV_KX kernel/xla" 2400 python -u probes/convprobe.py
run "R4F-4. bench LEVEL_SPLAT=exact" 1800 env FLDRX_LEVEL_SPLAT=exact python bench.py
echo "=== R4F-5. trainprobe B=8 512^2 — $(date -u)" | tee -a "$LOG"
bash probes/run_tpu.sh 5400 python -u probes/trainprobe.py > /tmp/trainprobe.out 2>&1
echo "trainprobe rc=$? (full log /tmp/trainprobe.out)" | tee -a "$LOG"
tail -6 /tmp/trainprobe.out | tee -a "$LOG"
run "R4F-6. evalprobe EVAL_DEFER A/B (2 scenes)" 7200 python -u probes/evalprobe.py 2
echo "=== R4F batch done — $(date -u)" | tee -a "$LOG"
