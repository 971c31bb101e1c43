#!/usr/bin/env bash
# Train CIM on TPU (reference scripts/train_CIM.sh equivalent).
set -euo pipefail

cfg_file=${CFG:-./configs/resnet50_voc.yaml}
dataset=${DATASET:-voc2012trainaug}

python ./tools/train.py \
  --dataset "${dataset}" \
  --cfg "${cfg_file}" "$@"
