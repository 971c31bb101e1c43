#!/usr/bin/env bash
# Inference + instance-seg evaluation (reference scripts/eval_CIM.sh).
set -euo pipefail

cfg_file=${CFG:-./configs/resnet50_voc.yaml}
output_dir=${OUTPUT:-./Outputs/resnet50_voc}
dataset=${DATASET:-voc2012sbdval}
cob_dir=${COB_DIR:-./data/VOC2012/COB_SBD_val}

ckpt=${output_dir}/ckpt
result_pkl=${output_dir}/test/detections.pkl

# generate detections.pkl on the test set (TTA)
python -u tools/test_net.py \
  --cfg "${cfg_file}" \
  --load_ckpt "${ckpt}" \
  --dataset "${dataset}" \
  --output_dir "${output_dir}/test"

# report instance-segmentation mAP@{25,50,70,75}
python tools/evaluation.py \
  --cfg "${cfg_file}" \
  --result_path "${result_pkl}" \
  --dataset "${dataset}" \
  --cob_dir "${cob_dir}"
