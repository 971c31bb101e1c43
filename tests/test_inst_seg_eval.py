"""Instance-segmentation evaluation end-to-end: synthetic gt + detections
through the eval shard (NMS-with-indices, RLE encode) and
coco_inst_seg_eval at the CIM thresholds (reference tools/evaluation.py +
lib/datasets/json_inference.py)."""
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cim_tpu.data.synthetic import synthetic_masks
from cim_tpu.evaluation import rle as rle_util
from cim_tpu.evaluation.coco import COCO
from tools.evaluation import coco_inst_seg_eval, eval_shard


def _gt_dataset(rng, n_images=2):
    images, annotations = [], []
    gt_masks = {}
    aid = 1
    for i in range(n_images):
        h, w = 60, 80
        images.append({"id": i + 1, "width": w, "height": h,
                       "file_name": f"{i}.jpg"})
        masks, _ = synthetic_masks(rng, 3, h, w)
        gt_masks[i + 1] = masks
        for j in range(3):
            enc = rle_util.encode(masks[j].astype(np.uint8))
            annotations.append({
                "id": aid, "image_id": i + 1, "category_id": (j % 4) + 1,
                "segmentation": enc, "area": int(masks[j].sum()),
                "bbox": rle_util.to_bbox(enc).tolist(), "iscrowd": 0,
            })
            aid += 1
    cats = [{"id": c + 1, "name": f"c{c}"} for c in range(20)]
    return COCO({"images": images, "annotations": annotations,
                 "categories": cats}), gt_masks


def test_perfect_predictions_give_map_one(rng):
    gt, gt_masks = _gt_dataset(rng)
    results = []
    for img_id, masks in gt_masks.items():
        for j in range(3):
            results.append({
                "image_id": img_id, "category_id": (j % 4) + 1,
                "segmentation": rle_util.encode(masks[j].astype(np.uint8)),
                "score": 0.9,
            })
    metrics = coco_inst_seg_eval(gt, results)
    for t in (25, 50, 70, 75):
        assert abs(metrics[f"mAP{t}"] - 1.0) < 1e-6, metrics


def test_eval_shard_produces_valid_rles(rng):
    """The eval shard keeps proposal indices through NMS and RLE-encodes
    the selected masks."""
    gt, gt_masks = _gt_dataset(rng, n_images=1)
    n_props = 12
    masks, boxes = synthetic_masks(rng, n_props, 60, 80)
    entry = {
        "id": 1, "image": "img1.jpg", "height": 60, "width": 80,
        "boxes": boxes.astype(np.float32),
        "masks": (rng.rand(n_props, 7, 7) > 0.5).astype(np.float32),
        "gt_classes": np.ones((1, 20), np.int32),
    }
    scores = rng.dirichlet(np.ones(20), size=n_props).astype(np.float32)
    detections = {"img1.jpg": {"scores": scores, "boxes": boxes}}
    opts = {"num_classes": 20, "score_thresh": 1e-5, "nms": 0.3,
            "proposal_filter": False}
    out = eval_shard((opts, [entry], detections, None, list(range(1, 21))))
    assert len(out) > 0
    for r in out:
        m = rle_util.decode(r["segmentation"])
        assert m.shape == (60, 80)
        assert r["category_id"] in range(1, 21)
        assert 0 <= r["score"] <= 1
