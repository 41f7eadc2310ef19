#!/usr/bin/env bash
# Rotation-augment intake sweep (x12/x8/x4/x1) on res18.
set -e
cd "$(dirname "$0")/.."
for exp in exp79 exp80 exp81 exp82; do
    python train.py "configs/${exp}.json" -gpu
done
