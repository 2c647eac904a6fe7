#!/bin/bash
# round-4i: follow-ups after the R4H adoption (naive-einsum resize + exact
# coarse splat are now defaults). Waits for the r4h batch to release the
# chip, then:
#   1. bench T_CHUNK=7      (one synthesis launch/pair; the r4 sweep stopped
#                            at 4 — 2/3/4 = 4.633/4.653/4.698, still rising —
#                            and planes_out/u8/blend24 freed the HBM that made
#                            7 OOM in r2)
#   2. bench T_CHUNK=5      (fallback point if 7 OOMs)
#   3. defaults bench       (confirm the post-flip headline from pure defaults)
#   4. bench OVERLAP=1      (pair-overlap dispatch protocol A/B)
#   5. flowprobe            (FLDRX_PCA_LAYOUT legacy/sumky ABAB)
#   6. bench CONV_ALIGN=16   (bf16-tile-aligned ky tap offsets, end-to-end)
# Appends to queue_results.log; serialized (one chip).
cd "$(dirname "$0")/.."
if [ -f /tmp/r4h.pid ]; then
  while kill -0 "$(cat /tmp/r4h.pid)" 2>/dev/null; do sleep 30; done
fi
LOG=queue_results.log
run() {
  echo "=== $1 — $(date -u)" | tee -a "$LOG"
  shift
  bash probes/run_tpu.sh "$@" 2>&1 | tail -12 | tee -a "$LOG"
}
run "R4I-1. bench T_CHUNK=7 (single synthesis launch/pair)" 2700 \
    env FLDRX_BENCH_T_CHUNK=7 python bench.py
run "R4I-2. bench T_CHUNK=5" 2700 \
    env FLDRX_BENCH_T_CHUNK=5 python bench.py
run "R4I-3. defaults bench (post R4H flip)" 2700 python bench.py
run "R4I-4. bench OVERLAP=1 (pair-overlap dispatch)" 1800 \
    env FLDRX_BENCH_OVERLAP=1 python bench.py
run "R4I-5. flowprobe PCA_LAYOUT ABAB" 3600 python -u probes/flowprobe.py
run "R4I-6. bench CONV_ALIGN=16" 2700 \
    env FLDRX_CONV_ALIGN=16 python bench.py
echo "=== R4I batch done — $(date -u)" | tee -a "$LOG"
