#!/bin/bash
# round-4b measurement batch (run after the 529-outage sessions):
#   1. defaults bench confirm (expect ~4.67)
#   2. t_chunk re-sweep under the r4 winner defaults (2/4; 3 is default)
#   3. train-step throughput (VERDICT r3 weak #6 — PROFILE train row)
#   4. FLDRX_EVAL_DEFER A/B on the real evaluator (pair overlap)
# Appends to queue_results.log; serialized (one chip).
cd "$(dirname "$0")/.."
LOG=queue_results.log
run() {
  echo "=== $1 — $(date -u)" | tee -a "$LOG"
  shift
  bash probes/run_tpu.sh "$@" 2>&1 | tail -12 | tee -a "$LOG"
}
run "R4B-1. defaults bench confirm" 1800 python bench.py
run "R4B-2. t_chunk=4 re-sweep" 1800 env FLDRX_BENCH_T_CHUNK=4 python bench.py
run "R4B-3. t_chunk=2 re-sweep" 1800 env FLDRX_BENCH_T_CHUNK=2 python bench.py
run "R4B-4. trainprobe B=8 512^2" 2400 python -u probes/trainprobe.py
run "R4B-5. evalprobe EVAL_DEFER A/B (2 scenes)" 5400 python -u probes/evalprobe.py 2
echo "=== R4B batch done — $(date -u)" | tee -a "$LOG"
