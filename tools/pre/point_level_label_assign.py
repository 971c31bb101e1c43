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
    """points: list of (x, y, class_idx, conf), applied in file order
    (reference point_level_label_assign.py:66-95 — the same loop as
    AGPL's, shared via assign_cluster_sites)."""
    from tools.pre.AGPL_label_assign import assign_cluster_sites

    sites = [(int(y), int(x), class_idx) for x, y, class_idx, _conf in points]
    return assign_cluster_sites(mask_proposals, sites, num_classes)


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
