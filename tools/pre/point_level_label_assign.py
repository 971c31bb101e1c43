#!/usr/bin/env python
"""Point-level label assignment (CIM-p): human click points -> cluster
matrix (reference tools/pre/point_level_label_assign.py:24-103).

Same assignment rule as AGPL but peaks are replaced by annotated points
read from Center_points/<image>.txt lines "x y class conf".
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="Point-level label assignment")
    parser.add_argument("--ann_file", required=True)
    parser.add_argument("--cob_dir", required=True)
    parser.add_argument("--points_dir", required=True,
                        help="Center_points directory of <image>.txt files")
    parser.add_argument("--output", required=True)
    parser.add_argument("--num_classes", type=int, default=20)
    parser.add_argument("--dataset", choices=["voc", "coco"], default="voc")
    return parser.parse_args()


def assign_from_points(mask_proposals, points, num_classes):
    """points: list of (x, y, class_idx, conf)."""
    num_proposal = len(mask_proposals)
    la = np.zeros((num_proposal, num_classes + 1), np.float32)
    cluster_idx = 1
    if not points:
        la[:, 0] = cluster_idx
        return la
    flat = mask_proposals.reshape(num_proposal, -1).astype(np.float32)
    areas = flat.sum(-1)
    bg_agg = np.zeros(num_proposal, np.float32)
    for x, y, class_idx, _conf in points:
        x = int(x)
        y = int(y)
        covering = mask_proposals[:, y, x] > 0
        if covering.any():
            avgmask = mask_proposals[covering].mean(0) > 0.7
        else:
            # a point covered by no proposal still advances the cluster
            # index (reference semantics: mean-of-empty -> all-False
            # supermask; pinned by tests/test_reference_exec_label_assign
            # for the identical AGPL loop, point_level_label_assign.py:66-90)
            avgmask = np.zeros(mask_proposals.shape[1:], bool)
        af = avgmask.reshape(-1).astype(np.float32)
        inter = flat @ af
        union = areas + af.sum() - inter
        iou = np.where(union > 0, inter / union, 0.0)
        assign = iou > 0.5
        la[assign, :] = 0
        la[assign, int(class_idx) + 1] = cluster_idx
        bg_agg += ((iou <= 0.5) & (iou != 0)).astype(np.float32)
        cluster_idx += 1
    bg = (bg_agg != 0) & (la.sum(1) == 0)
    la[bg, 0] = cluster_idx
    return la


def main():
    from scipy.io import loadmat

    from cim_tpu.evaluation.coco import COCO
    from tools.pre.generate_7_7 import mat_path_for

    args = parse_args()
    coco_gt = COCO(args.ann_file)
    img_ids = sorted(coco_gt.getImgIds())

    out = {"indexes": [], "mat": []}
    for k, img_id in enumerate(img_ids):
        mat = loadmat(
            mat_path_for(args.cob_dir, img_id, args.dataset),
            verify_compressed_data_integrity=False,
        )["maskmat"]
        proposals = mat[:, 0] if mat.ndim == 2 else mat
        mask_proposals = np.stack([np.asarray(p) for p in proposals])

        s = str(int(img_id))
        file_name = s[:4] + "_" + s[4:] if args.dataset == "voc" else f"{int(img_id):012d}"
        txt = os.path.join(args.points_dir, file_name + ".txt")
        points = []
        if os.path.exists(txt):
            with open(txt) as pf:
                for line in pf.read().splitlines():
                    p = line.strip().split(" ")
                    if len(p) >= 3:
                        points.append(
                            (float(p[0]), float(p[1]), int(p[2]),
                             float(p[3]) if len(p) > 3 else 1.0)
                        )
        la = assign_from_points(mask_proposals, points, args.num_classes)
        out["indexes"].append(img_id)
        out["mat"].append(la)
        if k % 100 == 0:
            print(f"{k + 1}/{len(img_ids)}", flush=True)

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        pickle.dump(out, f, pickle.HIGHEST_PROTOCOL)
    print(f"wrote {len(out['indexes'])} mats -> {args.output}")


if __name__ == "__main__":
    main()
