#!/usr/bin/env python
"""AGPL label assignment: PRM peaks -> proposal cluster matrix
(reference tools/pre/AGPL_label_assign.py:107-277).

For each training image:
  1. run the PRM model (FC-ResNet50, 448x448 input, CRMs upsampled x8)
     restricted to the image's ground-truth classes;
  2. for each peak (ascending score order): proposals whose mask covers
     the peak location -> average "super-mask" > 0.7 -> proposals with
     mask-IoU > 0.5 against it are assigned to a new cluster of the
     peak's class;
  3. proposals overlapping (IoU in (0, 0.5]) any cluster's super-mask but
     assigned nowhere form the background cluster.

Emits {indexes, mat} pkl (TRAIN.REFINE_FILES input). The reference runs
8 worker processes each doing one .backward per peak; here the image's
whole peak block is one vmapped vjp on the TPU.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="AGPL label assignment")
    parser.add_argument("--ann_file", required=True)
    parser.add_argument("--img_dir", required=True)
    parser.add_argument("--cob_dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--prm_ckpt", default=None,
                        help="torch PRM checkpoint (fc_resnet50) to convert; "
                        "random init if absent (for pipeline testing)")
    parser.add_argument("--num_classes", type=int, default=20)
    parser.add_argument("--dataset", choices=["voc", "coco"], default="voc")
    parser.add_argument("--peak_threshold", type=float, default=10.0)
    return parser.parse_args()


def assign_cluster_sites(mask_proposals, sites, num_classes):
    """Shared assignment core (reference AGPL_label_assign.py:145-185 ==
    point_level_label_assign.py:66-95, byte-identical loops upstream).

    sites: iterable of (py, px, class_idx) in MASK PIXEL space, already
    in application order (AGPL: ascending peak score; points: file
    order). Per site: covering-proposal supermask avg>0.7 -> IoU>0.5
    cluster assignment (later sites override), aggregate near-miss rows
    into one trailing bg cluster. A site covered by NO proposal assigns
    nothing but still advances the cluster index (reference
    mean-of-empty -> all-False supermask) — cluster ids must match
    reference-generated mats exactly (they seed PCL clusters; pinned by
    tests/test_reference_exec_label_assign.py)."""
    num_proposal = len(mask_proposals)
    la = np.zeros((num_proposal, num_classes + 1), np.float32)
    cluster_idx = 1
    mh, mw = mask_proposals.shape[1:]
    flat = mask_proposals.reshape(num_proposal, -1).astype(np.float32)
    areas = flat.sum(-1)
    bg_agg = np.zeros(num_proposal, np.float32)
    any_site = False
    for py, px, class_idx in sites:
        any_site = True
        covering = mask_proposals[:, py, px] > 0
        if covering.any():
            avgmask = mask_proposals[covering].mean(0) > 0.7
        else:
            avgmask = np.zeros((mh, mw), bool)
        af = avgmask.reshape(-1).astype(np.float32)
        inter = flat @ af
        union = areas + af.sum() - inter
        iou = np.where(union > 0, inter / union, 0.0)
        assign = iou > 0.5
        la[assign, :] = 0
        la[assign, int(class_idx) + 1] = cluster_idx
        bg_agg += ((iou <= 0.5) & (iou != 0)).astype(np.float32)
        cluster_idx += 1
    if not any_site:
        la[:, 0] = cluster_idx
        return la
    bg = (bg_agg != 0) & (la.sum(1) == 0)
    la[bg, 0] = cluster_idx
    return la


def assign_image(mask_proposals, peaks, peak_scores, num_peaks, num_classes,
                 crm_size=112):
    """Steps 2-3 for one image (reference :145-185). peaks: (K, 3) [y,x,cls]
    in the upsampled CRM space (112 = 14 * 8), applied ascending by score."""
    mh, mw = mask_proposals.shape[1:]
    order = np.argsort(np.asarray(peak_scores)[:num_peaks])

    def sites():
        for j in order:
            y, x, class_idx = peaks[j]
            py = min(int(y * mh / crm_size), mh - 1)
            px = min(int(x * mw / crm_size), mw - 1)
            yield py, px, class_idx

    return assign_cluster_sites(mask_proposals, sites(), num_classes)


def main():
    import jax
    from scipy.io import loadmat

    from cim_tpu.data.transforms import TORCH_MEAN, TORCH_STD
    from cim_tpu.evaluation.coco import COCO
    from cim_tpu.prm.model import PeakResponseMapper
    from tools.pre.generate_7_7 import mat_path_for

    args = parse_args()
    coco_gt = COCO(args.ann_file)
    img_ids = sorted(coco_gt.getImgIds())
    cat_ids = sorted(coco_gt.getCatIds())
    cat_to_contig = {c: i for i, c in enumerate(cat_ids)}

    mapper = PeakResponseMapper(
        num_classes=args.num_classes, sub_pixel_locating_factor=8,
        peak_threshold=args.peak_threshold,
    )
    variables = mapper.init(jax.random.PRNGKey(0), image_hw=(448, 448))
    if args.prm_ckpt:
        import torch

        from cim_tpu.utils.torch_weights import convert_prm_checkpoint

        sd = torch.load(args.prm_ckpt, map_location="cpu")
        sd = sd.get("model", sd.get("state_dict", sd))
        variables = convert_prm_checkpoint(sd, args.num_classes)

    from PIL import Image

    out = {"indexes": [], "mat": []}
    for k, img_id in enumerate(img_ids):
        info = coco_gt.imgs[img_id]
        path = os.path.join(args.img_dir, info.get("file_name", ""))
        img = Image.open(path).convert("RGB").resize((448, 448), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
        arr = (arr - TORCH_MEAN) / TORCH_STD

        gt_classes = sorted(
            {
                cat_to_contig[a["category_id"]]
                for a in coco_gt.img_to_anns[img_id]
            }
        )

        mat = loadmat(
            mat_path_for(args.cob_dir, img_id, args.dataset),
            verify_compressed_data_integrity=False,
        )["maskmat"]
        proposals = mat[:, 0] if mat.ndim == 2 else mat
        mask_proposals = np.stack([np.asarray(p) for p in proposals])

        peaks_out = mapper.inference_gt(variables, arr, gt_classes)
        la = assign_image(
            mask_proposals, peaks_out.peaks, peaks_out.peak_scores,
            peaks_out.num_peaks, args.num_classes,
        )
        out["indexes"].append(img_id)
        out["mat"].append(la)
        if k % 50 == 0:
            print(f"{k + 1}/{len(img_ids)}", flush=True)

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        pickle.dump(out, f, pickle.HIGHEST_PROTOCOL)
    print(f"wrote {len(out['indexes'])} mats -> {args.output}")


if __name__ == "__main__":
    main()
