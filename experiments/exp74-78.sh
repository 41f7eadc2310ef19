#!/usr/bin/env bash
# Backbone-depth sweep on the full dataset (reference: experiments/exp74-78.sh,
# minus the cloud-box upload/shutdown steps — results land in ./workspace).
set -e
cd "$(dirname "$0")/.."
for exp in exp74 exp75 exp76 exp77 exp78; do
    python train.py "configs/${exp}.json" -gpu
done
