#!/bin/bash
# round-4e: trainprobe retry (r4b attempt exited silently), full output
# captured to /tmp/trainprobe.out. Waits for r4d.
cd "$(dirname "$0")/.."
LOG=queue_results.log
while ! grep -q "R4D batch done" "$LOG" 2>/dev/null; do sleep 60; done
echo "=== R4E-1. trainprobe B=8 512^2 (single 5400s attempt) — $(date -u)" | tee -a "$LOG"
timeout -k 30 5400 python -u probes/trainprobe.py > /tmp/trainprobe.out 2>&1
rc=$?
tail -6 /tmp/trainprobe.out | tee -a "$LOG"
echo "trainprobe rc=$rc" | tee -a "$LOG"
echo "=== R4E batch done — $(date -u)" | tee -a "$LOG"
