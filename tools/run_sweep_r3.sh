#!/bin/bash
# Round-3 dataset-axis sweep: resume exp80 (from iter 3300) then run
# exp81-86 at the reference cadence (experiments/exp79-82.sh, exp83-86.sh).
# Sequential: the TPU is single-tenant through the tunnel.
cd /root/repo
mkdir -p workspace/logs
echo "sweep start: $(date)" > workspace/logs/sweep_r3.status

run() {
  local name="$1"; shift
  echo "[$(date +%H:%M:%S)] START $name" >> workspace/logs/sweep_r3.status
  timeout 2600 python train.py "$@" -gpu > "workspace/logs/$name.log" 2>&1
  local rc=$?
  echo "[$(date +%H:%M:%S)] DONE  $name rc=$rc" >> workspace/logs/sweep_r3.status
}

run exp80-resume configs/exp80.resume.json
for e in 81 82 83 84 85 86; do
  run exp$e configs/exp$e.json
done
echo "sweep done: $(date)" >> workspace/logs/sweep_r3.status
