#!/bin/bash
# round-5c: the gates built after the r5b batch was written, plus the
# hardware-training evidence run (VERDICT r4 item 8) and the T_CHUNK
# re-sweep moved here from r5b's tail.
#   1. bench Z_HALFRES=1     — half-res z importance metrics (50a240d);
#                              z-stage is 92 ms/pair vs ~45 floor
#   2. goldenclip Z_HALFRES  — its quality gate (0.05 dB budget)
#   3. trainrun              — few-hundred-step TPU train through the real
#                              train() driver: loss curve, steps/s, and the
#                              save → resume → bitwise-continue check
#   4-5. bench T_CHUNK=7 / 5 — r4k re-sweep (planes_out freed the HBM that
#                              made 7 OOM in r2)
# Waits for the r5a+r5b wrapper (/tmp/r5ab.pid) to release the chip.
cd "$(dirname "$0")/.."
if [ -f /tmp/r5ab.pid ]; then
  while kill -0 "$(cat /tmp/r5ab.pid)" 2>/dev/null; do sleep 30; done
fi
LOG=queue_results.log
run() {
  echo "=== $1 — $(date -u)" | tee -a "$LOG"
  shift
  bash probes/run_tpu.sh "$@" 2>&1 | tail -14 | tee -a "$LOG"
}
run "R5C-0. blendprobe full vs full96 (wide-minor softmax)" 2400 \
    python -u probes/blendprobe.py
run "R5C-0b. convprobe ALIGN x KX rerun (fault-tolerant cells)" 2700 \
    python -u probes/convprobe.py
run "R5C-0c. convprobe CONV_FORM=kcat rerun" 2700 \
    env FLDRX_CONV_FORM=kcat python -u probes/convprobe.py
run "R5C-1. bench BLEND96=1 (ulp-safe: CI dB-pin covers quality)" 2700 \
    env FLDRX_BLEND96=1 python bench.py
run "R5C-2. bench Z_HALFRES=1" 2700 env FLDRX_Z_HALFRES=1 python bench.py
run "R5C-2b. bench SPLAT_YWIN=1 (factored-placement splat)" 2700 \
    env FLDRX_SPLAT_YWIN=1 python bench.py
run "R5C-3. goldenclip deploy Z_HALFRES=1" 2700 \
    env FLDRX_GOLDEN_CONFIGS=deploy FLDRX_Z_HALFRES=1 \
    python -u -m fldrx.tools.goldenclip_report
run "R5C-4. goldenclip deploy SPLAT_YWIN=1" 3600 \
    env FLDRX_GOLDEN_CONFIGS=deploy FLDRX_SPLAT_YWIN=1 \
    python -u -m fldrx.tools.goldenclip_report
run "R5C-5. trainrun 18+2 epochs (loss curve + resume check)" 7200 \
    python -u probes/trainrun.py 18 2
echo "=== R5C batch done — $(date -u)" | tee -a "$LOG"
# (T_CHUNK 7/5 re-sweep dropped: lowest expected value, and the round-end
# defaults-confirm bench after gate adoption takes priority — run manually
# as R5E once winners are flipped.)
