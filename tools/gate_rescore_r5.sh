#!/bin/bash
# Round-5 gate ablation: re-score the corner-family checkpoints under the
# point gate (window=1, the round-4 decode) and the windowed gate
# (window=5) to separate the decode artifact from model regression.
set -u
cd /root/repo
OUT=workspace/results/gate_rescore_r5.txt
: > $OUT
run() {
  local win=$1 cfg=$2 ckpt=$3
  echo "=== window=$win $ckpt ===" | tee -a $OUT
  SCD_CORNER_CENTER_WINDOW=$win timeout 900 python tools/eval_checkpoint.py \
    "$cfg" "$ckpt" 2>&1 | grep -E "^\[It\]|error|Error" | tee -a $OUT
}
run 1 configs/corner_tuned.json workspace/temp/cornerRes10.corner-tuned-r5.4400.pth
run 5 configs/corner_tuned.json workspace/temp/cornerRes10.corner-tuned-r5.4400.pth
run 5 configs/corner_tuned.json workspace/temp/cornerRes10.corner-tuned-r5.best.pth
run 1 configs/corner_tuned.json workspace/temp/cornerRes10.corner-tuned-r5.best.pth
run 1 configs/cpool_best_r5.json workspace/temp/cornerCPoolRes10.cpool-best-r5.13200.pth
run 5 configs/cpool_best_r5.json workspace/temp/cornerCPoolRes10.cpool-best-r5.13200.pth
run 5 configs/cpool_best_r5.json workspace/temp/cornerCPoolRes10.cpool-best-r5.best.pth
echo "ALL DONE" | tee -a $OUT
