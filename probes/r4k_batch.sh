#!/bin/bash
# round-4k: consolidated priority queue for the remaining session window.
# Replaces the tails of r4h/r4i/r4j (killed): with ~2h of chip time left,
# bench-headline experiments run FIRST; diagnostics (evalprobe, perfprobe2)
# only if time remains. Waits for the in-flight trainprobe to release the
# chip.
cd "$(dirname "$0")/.."
if [ -f /tmp/trainprobe_wait.pid ]; then
  while kill -0 "$(cat /tmp/trainprobe_wait.pid)" 2>/dev/null; do sleep 20; done
fi
LOG=queue_results.log
run() {
  echo "=== $1 — $(date -u)" | tee -a "$LOG"
  shift
  bash probes/run_tpu.sh "$@" 2>&1 | tail -12 | tee -a "$LOG"
}
# 1-2: cached programs (post-R4H-flip defaults) — fast, decisive
run "R4K-1. defaults bench (post R4H flip)" 1800 python bench.py
run "R4K-2. bench OVERLAP=1 (pair-overlap dispatch)" 1800 \
    env FLDRX_BENCH_OVERLAP=1 python bench.py
# 3: single synthesis launch per pair (new compile)
run "R4K-3. bench T_CHUNK=7" 3600 \
    env FLDRX_BENCH_T_CHUNK=7 python bench.py
# 4: pair-batched throughput (new B=2 compile)
run "R4K-4. bench PAIRS=2 T_CHUNK=2" 3600 \
    env FLDRX_BENCH_PAIRS=2 FLDRX_BENCH_T_CHUNK=2 python bench.py
# 5: PCA layout decider (flow-stage probe)
run "R4K-5. flowprobe PCA_LAYOUT ABAB" 3600 python -u probes/flowprobe.py
# 6: conv gates, kernel-level
run "R4K-6. convprobe CONV_KX/ALIGN" 2400 python -u probes/convprobe.py
# 7-8: follow-ups (likely past the session end; harmless if cut)
run "R4K-7. bench T_CHUNK=5" 3600 \
    env FLDRX_BENCH_T_CHUNK=5 python bench.py
run "R4K-8. bench PAIRS=2 T_CHUNK=4" 3600 \
    env FLDRX_BENCH_PAIRS=2 FLDRX_BENCH_T_CHUNK=4 python bench.py
run "R4K-9. evalprobe EVAL_DEFER A/B (2 scenes)" 7200 python -u probes/evalprobe.py 2
echo "=== R4K batch done — $(date -u)" | tee -a "$LOG"
