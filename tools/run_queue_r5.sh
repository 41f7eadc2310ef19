#!/bin/bash
# Round-5 TPU queue (single-tenant chip: strictly sequential):
# 1. hourglass2 best-snapshot rerun — recreates the round-4 champion
#    artifact (deterministic replay) for the torch export + F1 scoring.
# 2. corner-tuned schedule (VERDICT #2).
# 3. cornerCPool cadence rerun on the Pallas pool backward (VERDICT #4).
cd /root/repo
echo "queue start: $(date)" > workspace/logs/queue_r5.status

run() {
  local name="$1" tmo="$2"; shift 2
  echo "[$(date +%H:%M:%S)] START $name" >> workspace/logs/queue_r5.status
  timeout "$tmo" python train.py "$@" -gpu > "workspace/logs/$name.log" 2>&1
  local rc=$?
  echo "[$(date +%H:%M:%S)] DONE  $name rc=$rc" >> workspace/logs/queue_r5.status
}

run hourglass2-best-r5 4200 configs/hourglass2_best_r5.json
run corner-tuned-r5 1800 configs/corner_tuned.json
run cpool-best-r5 5800 configs/cpool_best_r5.json
echo "queue done: $(date)" >> workspace/logs/queue_r5.status
