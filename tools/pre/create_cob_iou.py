#!/usr/bin/env python
"""Per-image N x N mask-IoU and asymmetric-IoU matrices from COB proposals.

Reference: tools/pre/create_cob_iou.py / create_cob_asy_iou.py compute
these with a cupy python loop per proposal; here both matrices come from
one jitted einsum pair on the TPU (cim_tpu.ops.mask_iou), computed in a
single pass per image, stored float16 pkl per image (same on-disk format
the trainer consumes via cfg.iou_dir / cfg.asy_iou_dir).
"""
import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="COB IoU matrices")
    parser.add_argument("--ann_file", required=True)
    parser.add_argument("--cob_dir", required=True)
    parser.add_argument("--iou_dir", required=True)
    parser.add_argument("--asy_iou_dir", required=True)
    parser.add_argument("--dataset", choices=["voc", "coco"], default="voc")
    parser.add_argument("--pad_to", type=int, default=128,
                        help="pad proposal count to multiples (fewer compiles)")
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from scipy.io import loadmat

    from cim_tpu.ops.mask_iou import mask_asymmetric_iou, mask_iou
    from tools.pre.generate_7_7 import mat_path_for

    @jax.jit
    def both(masks):
        return mask_iou(masks, masks), mask_asymmetric_iou(masks, masks)

    with open(args.ann_file) as f:
        images = json.load(f)["images"]
    os.makedirs(args.iou_dir, exist_ok=True)
    os.makedirs(args.asy_iou_dir, exist_ok=True)

    for k, im in enumerate(sorted(images, key=lambda x: x["id"])):
        path = mat_path_for(args.cob_dir, im["id"], args.dataset)
        mat = loadmat(path, verify_compressed_data_integrity=False)["maskmat"]
        proposals = mat[:, 0] if mat.ndim == 2 else mat
        masks = np.stack([np.asarray(p, bool) for p in proposals])
        n = masks.shape[0]
        # pad N so XLA reuses a small set of compiled programs
        n_pad = int(np.ceil(n / args.pad_to) * args.pad_to)
        if n_pad != n:
            masks = np.concatenate(
                [masks, np.zeros((n_pad - n,) + masks.shape[1:], bool)]
            )
        iou, asy = both(jnp.asarray(masks))
        iou = np.asarray(iou)[:n, :n].astype(np.float16)
        asy = np.asarray(asy)[:n, :n].astype(np.float16)

        base = os.path.splitext(os.path.basename(path))[0] + ".pkl"
        with open(os.path.join(args.iou_dir, base), "wb") as f:
            pickle.dump(iou, f, pickle.HIGHEST_PROTOCOL)
        with open(os.path.join(args.asy_iou_dir, base), "wb") as f:
            pickle.dump(asy, f, pickle.HIGHEST_PROTOCOL)
        if k % 100 == 0:
            print(f"{k + 1}/{len(images)}", flush=True)
    print("done")


if __name__ == "__main__":
    main()
