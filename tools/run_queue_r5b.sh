#!/bin/bash
# Round-5 TPU queue, part 2 — champion-schedule probes (single-tenant
# chip: strictly sequential):
# 1. hg2-earlydecay-r5: the round-4 champion's validation PEAKS at iter
#    8,800 then dips after the 11,000 LR decay. Decay EARLIER (7,700 and
#    9,900, /10 each) to try to lock the peak in — dense 550-iter
#    validation + best tracking.
# 2. hg2-dense-r5: the champion schedule unchanged, validation every 550
#    instead of 1,100 — the training trajectory is deterministic and
#    validation consumes no training randomness, so shared grid points
#    must reproduce 74.82 @8,800 while the finer grid may surface a
#    higher peak between the old points.
cd /root/repo
echo "queue start: $(date)" > workspace/logs/queue_r5b.status

run() {
  local name="$1" tmo="$2"; shift 2
  echo "[$(date +%H:%M:%S)] START $name" >> workspace/logs/queue_r5b.status
  timeout "$tmo" python train.py "$@" -gpu > "workspace/logs/$name.log" 2>&1
  local rc=$?
  echo "[$(date +%H:%M:%S)] DONE  $name rc=$rc" >> workspace/logs/queue_r5b.status
}

run hg2-earlydecay-r5 4800 configs/hourglass2_earlydecay_r5.json
run hg2-dense-r5 4800 configs/hourglass2_dense_r5.json
echo "queue done: $(date)" >> workspace/logs/queue_r5b.status
