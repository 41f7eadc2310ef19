#!/bin/bash
# Round-5 gate ablation, part 2: the NMS-peak gate (CenterNet-triplets
# "detected center keypoint in the central region") and a tighter window,
# re-scored on the same four checkpoints as gate_rescore_r5.txt.
set -u
cd /root/repo
OUT=workspace/results/gate_rescore_r5b.txt
: > $OUT
run() {
  local gate=$1 win=$2 cfg=$3 ckpt=$4
  echo "=== gate=$gate window=$win $ckpt ===" | tee -a $OUT
  SCD_CORNER_CENTER_GATE=$gate SCD_CORNER_CENTER_WINDOW=$win \
    timeout 900 python tools/eval_checkpoint.py \
    "$cfg" "$ckpt" 2>&1 | grep -E "^\[It\]|error|Error" | tee -a $OUT
}
run peak 5 configs/corner_tuned.json workspace/temp/cornerRes10.corner-tuned-r5.best.pth
run peak 5 configs/corner_tuned.json workspace/temp/cornerRes10.corner-tuned-r5.4400.pth
run peak 5 configs/cpool_best_r5.json workspace/temp/cornerCPoolRes10.cpool-best-r5.best.pth
run peak 5 configs/cpool_best_r5.json workspace/temp/cornerCPoolRes10.cpool-best-r5.13200.pth
run window 3 configs/corner_tuned.json workspace/temp/cornerRes10.corner-tuned-r5.best.pth
run window 3 configs/corner_tuned.json workspace/temp/cornerRes10.corner-tuned-r5.4400.pth
echo "ALL DONE" | tee -a $OUT
