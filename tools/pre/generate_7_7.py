#!/usr/bin/env python
"""Rasterize full-resolution COB proposals to MASK_SIZE x MASK_SIZE crops
(reference tools/pre/generate_7_7_voc.py:14-47 / generate_7_7_coco.py).

For each COB .mat: tight bbox per mask, crop, nearest-resize to SxS bool;
emits one pkl {indexes, masks, boxes, scores} consumed by the data layer
(TRAIN/TEST.PROPOSAL_FILES).
"""
import argparse
import multiprocessing as mp
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="Generate SxS proposal masks")
    parser.add_argument("--ann_file", required=True,
                        help="COCO-json annotation file (image list source)")
    parser.add_argument("--cob_dir", required=True,
                        help="directory of COB .mat proposals")
    parser.add_argument("--output", required=True, help="output pkl")
    parser.add_argument("--mask_size", type=int, default=7)
    parser.add_argument("--dataset", choices=["voc", "coco"], default="voc")
    parser.add_argument("--nprocs", type=int, default=8)
    return parser.parse_args()


def mat_path_for(cob_dir, img_id, dataset):
    if dataset == "voc":
        s = str(int(img_id))
        return os.path.join(cob_dir, s[:4] + "_" + s[4:] + ".mat")
    return os.path.join(cob_dir, f"{int(img_id):012d}.mat")


def rasterize_one(payload):
    img_id, cob_dir, dataset, mask_size = payload
    from scipy.io import loadmat

    from cim_tpu.data.synthetic import masks_to_7x7

    mat = loadmat(
        mat_path_for(cob_dir, img_id, dataset),
        verify_compressed_data_integrity=False,
    )["maskmat"]
    proposals = mat[:, 0] if mat.ndim == 2 else mat
    masks = np.stack([np.asarray(p, bool) for p in proposals])
    n = masks.shape[0]
    # crop with INCLUSIVE extents; the STORED boxes use the reference's
    # exclusive-max convention [xmin, ymin, xmax+1, ymax+1] uint16
    # (generate_7_7_voc.py:36-40) — the downstream clip in json_dataset
    # only trims the border-touching case, so interior training boxes
    # genuinely carry the +1 and exact reproduction requires it
    incl = np.zeros((n, 4), np.float32)
    for i in range(n):
        ys, xs = np.nonzero(masks[i])
        # the reference crashes on min() of an empty set
        # (generate_7_7_voc.py:36) — an all-empty COB mask is corrupt
        # input and must fail loudly, not flow into training pkls as a
        # degenerate 1x1 box at the origin
        assert len(ys) > 0, f"empty COB proposal mask #{i} for image {img_id}"
        incl[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    small = masks_to_7x7(masks, incl) if mask_size == 7 else _resize(
        masks, incl, mask_size
    )
    boxes = incl.astype(np.uint16)
    boxes[:, 2:] += 1
    # reference emits all-zero scores (generate_7_7_voc.py:33); nothing in
    # the pipeline consumes them, but the pkl format matches exactly
    scores = np.zeros(n)
    return img_id, boxes, small.astype(bool), scores


def _resize(masks, boxes, s):
    out = np.zeros((masks.shape[0], s, s), bool)
    for i in range(masks.shape[0]):
        x1, y1, x2, y2 = boxes[i].astype(int)
        crop = masks[i, y1 : y2 + 1, x1 : x2 + 1]
        h, w = crop.shape
        ys = np.clip((np.arange(s) + 0.5) * h / s, 0, h - 1).astype(int)
        xs = np.clip((np.arange(s) + 0.5) * w / s, 0, w - 1).astype(int)
        out[i] = crop[np.ix_(ys, xs)]
    return out


def main():
    args = parse_args()
    import json

    with open(args.ann_file) as f:
        images = json.load(f)["images"]
    img_ids = sorted(im["id"] for im in images)

    work = [(i, args.cob_dir, args.dataset, args.mask_size) for i in img_ids]
    if args.nprocs > 1:
        with mp.Pool(args.nprocs) as pool:
            outs = pool.map(rasterize_one, work)
    else:
        outs = [rasterize_one(w) for w in work]

    proposals = {
        "indexes": [o[0] for o in outs],
        "boxes": [o[1] for o in outs],
        "masks": [o[2] for o in outs],
        "scores": [o[3] for o in outs],
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        pickle.dump(proposals, f, pickle.HIGHEST_PROTOCOL)
    print(f"wrote {len(outs)} images -> {args.output}")


if __name__ == "__main__":
    main()
