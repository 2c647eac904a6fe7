#!/bin/bash
# round-5a: re-run the measurements the r4 relay outage ate, in priority
# order, FIRST thing in the round (VERDICT r4 items 1 and 5):
#   1. defaults bench        — the R4K-1 gap: defaults flipped to the R4H
#                              winners but the pure-defaults confirm never
#                              ran; also the round-start record
#   2. OVERLAP=1             — pair-overlap dispatch protocol (+8% ceiling)
#   3. PAIRS=2 T_CHUNK=2     — pair-batched throughput (4 problems/launch)
#   4. PAIRS=2 T_CHUNK=4     — 8/launch (memory risk; OOM is informative)
#   5. golden-clip deploy    — quality gate for the current defaults
#   6. evalprobe DEFER A/B   — real-evaluator pair overlap (2 scenes)
#   7. PAIRS=2 OVERLAP=1     — composed, if both halves win
# Appends to queue_results.log.
cd "$(dirname "$0")/.."
LOG=queue_results.log
run() {
  echo "=== $1 — $(date -u)" | tee -a "$LOG"
  shift
  bash probes/run_tpu.sh "$@" 2>&1 | tail -12 | tee -a "$LOG"
}
run "R5A-1. defaults bench (round-start record)" 2400 python bench.py
run "R5A-2. bench OVERLAP=1" 2400 env FLDRX_BENCH_OVERLAP=1 python bench.py
run "R5A-3. bench PAIRS=2 T_CHUNK=2" 3600 \
    env FLDRX_BENCH_PAIRS=2 FLDRX_BENCH_T_CHUNK=2 python bench.py
run "R5A-4. bench PAIRS=2 T_CHUNK=4" 3600 \
    env FLDRX_BENCH_PAIRS=2 FLDRX_BENCH_T_CHUNK=4 python bench.py
run "R5A-5. goldenclip deploy gate" 3600 \
    env FLDRX_GOLDEN_CONFIGS=deploy python -u -m fldrx.tools.goldenclip_report
run "R5A-6. evalprobe EVAL_DEFER A/B (2 scenes)" 7200 \
    python -u probes/evalprobe.py 2
run "R5A-7. bench PAIRS=2 T_CHUNK=2 OVERLAP=1" 2700 \
    env FLDRX_BENCH_PAIRS=2 FLDRX_BENCH_T_CHUNK=2 FLDRX_BENCH_OVERLAP=1 python bench.py
echo "=== R5A batch done — $(date -u)" | tee -a "$LOG"
