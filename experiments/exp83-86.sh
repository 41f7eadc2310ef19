#!/usr/bin/env bash
# Dataset-partition sweep (p50/p25/p10/p5) on res18.
set -e
cd "$(dirname "$0")/.."
for exp in exp83 exp84 exp85 exp86; do
    python train.py "configs/${exp}.json" -gpu
done
