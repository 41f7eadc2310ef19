#!/bin/bash
# Waits for the round-3 sweep to release the single-tenant TPU, then runs
# the scaled F1 pipeline's TPU stages (train -> serve -> eval).
cd /root/repo
STATUS=workspace/logs/sweep_r3.status
LOG=workspace/logs/f1_r3.log
echo "f1 watcher start: $(date)" > "$LOG"
while ! grep -q "sweep done" "$STATUS"; do sleep 60; done
echo "sweep released the chip: $(date)" >> "$LOG"
for stage in train serve eval; do
  echo "[$(date +%H:%M:%S)] START $stage" >> "$LOG"
  timeout 3000 python tools/f1_pipeline.py --root workspace/f1_r3 \
    --stage $stage >> "$LOG" 2>&1
  rc=$?
  echo "[$(date +%H:%M:%S)] DONE  $stage rc=$rc" >> "$LOG"
  [ $rc -ne 0 ] && break
done
echo "f1 watcher done: $(date)" >> "$LOG"
