#!/usr/bin/env bash
# Export pseudo labels for Mask R-CNN refinement
# (reference scripts/generate_msrcnn_label.sh).
set -euo pipefail

cfg_file=${CFG:-./configs/resnet50_voc.yaml}
output_dir=${OUTPUT:-./Outputs/resnet50_voc}
cob_dir=${COB_DIR:-./data/VOC2012/COB_SBD_trainaug}

# discovery.pkl over the TRAIN set (CorLoc protocol)
python -u tools/test_net.py \
  --cfg "${cfg_file}" \
  --load_ckpt "${output_dir}/ckpt" \
  --dataset voc2012trainaug \
  --output_dir "${output_dir}/discovery"

python tools/generate_mask_for_MaskRCNN.py \
  --cfg "${cfg_file}" \
  --result_path "${output_dir}/discovery/discovery.pkl" \
  --dataset voc2012trainaug \
  --cob_dir "${cob_dir}" \
  --output_dir "${output_dir}/pseudo_labels"

# keep annotations scoring >= 0.3 (the shipped pipeline's threshold)
python tools/change_mask_thr.py \
  --input "${output_dir}/pseudo_labels/msrcnn_pseudo_label.json" \
  --thr 0.3
