"""Pseudo-label exporter (tools/generate_mask_for_MaskRCNN.py): the
export shard must produce valid COCO annotations from discovery scores,
with --is_best keeping exactly the top-scoring instance per gt class."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cim_tpu.data.synthetic import synthetic_masks
from cim_tpu.evaluation import rle as rle_util
from tools.generate_mask_for_MaskRCNN import export_shard


def _case(rng, is_best):
    n_props = 15
    masks, boxes = synthetic_masks(rng, n_props, 50, 70)
    gt = np.zeros((1, 20), np.int32)
    gt[0, [2, 5]] = 1  # classes 2 and 5 present
    entry = {
        "id": 2008000001, "image": "2008_000001.jpg",
        "height": 50, "width": 70,
        "boxes": boxes.astype(np.float32),
        "masks": (rng.rand(n_props, 7, 7) > 0.5).astype(np.float32),
        "gt_classes": gt,
    }
    scores = rng.dirichlet(np.ones(20), size=n_props).astype(np.float32)
    detections = {entry["image"]: {"scores": scores, "boxes": boxes}}
    opts = {"num_classes": 20, "score_thresh": 1e-5, "nms": 0.3,
            "is_best": is_best}
    return export_shard((opts, [entry], detections, None))


def test_export_all_nms_survivors(rng):
    images, anns = _case(rng, is_best=False)
    assert len(images) == 1
    assert len(anns) >= 2  # at least one instance per present class
    cats = {a["category_id"] for a in anns}
    assert cats.issubset({3, 6})  # contiguous classes 2,5 -> VOC ids 3,6
    for a in anns:
        m = rle_util.decode(a["segmentation"])
        assert m.shape == (50, 70)
        assert a["area"] == int(m.sum()) > 0
        assert 0 <= a["score"] <= 1


def test_export_is_best_keeps_one_per_class(rng):
    _, anns = _case(rng, is_best=True)
    per_class = {}
    for a in anns:
        per_class.setdefault(a["category_id"], []).append(a)
    for cat, items in per_class.items():
        assert len(items) == 1, f"class {cat} kept {len(items)}"
