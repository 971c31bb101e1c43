"""box_results_with_nms_and_limit vs a transliterated oracle of
lib/core/test.py:355-423."""
import os

import numpy as np

from cim_tpu.config import clone_cfg, load_cfg
from cim_tpu.engine.test import box_results_with_nms_and_limit
from cim_tpu.ops.nms import nms_np

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _oracle(num_classes, score_thresh, nms_thr, det_per_im, scores, boxes):
    cls_boxes = [None] * num_classes
    for j in range(num_classes):
        inds = np.where(scores[:, j] > score_thresh)[0]
        dets_j = np.hstack(
            [boxes[inds], scores[inds, j][:, None]]
        ).astype(np.float32)
        keep = nms_np(dets_j, nms_thr)
        cls_boxes[j] = dets_j[keep]
    if det_per_im > 0:
        image_scores = np.hstack([cls_boxes[j][:, -1] for j in range(num_classes)])
        if len(image_scores) > det_per_im:
            thr = np.sort(image_scores)[-det_per_im]
            for j in range(num_classes):
                cls_boxes[j] = cls_boxes[j][cls_boxes[j][:, -1] >= thr]
    return cls_boxes


def test_box_results_matches_oracle(rng):
    cfg = clone_cfg(load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml")))
    cfg.TEST.DETECTIONS_PER_IM = 10
    n, c = 60, 20
    scores = rng.dirichlet(np.ones(c), size=n).astype(np.float32)
    x1 = rng.uniform(0, 60, n)
    y1 = rng.uniform(0, 60, n)
    boxes = np.stack(
        [x1, y1, x1 + rng.uniform(5, 40, n), y1 + rng.uniform(5, 40, n)], -1
    ).astype(np.float32)

    s, b, cls_boxes = box_results_with_nms_and_limit(cfg, scores, boxes)
    want = _oracle(c, cfg.TEST.SCORE_THRESH, cfg.TEST.NMS,
                   cfg.TEST.DETECTIONS_PER_IM, scores, boxes)
    # 1-indexed output with empty bg slot
    assert len(cls_boxes) == c + 1
    assert cls_boxes[0].shape == (0, 5)
    total = 0
    for j in range(c):
        np.testing.assert_allclose(cls_boxes[j + 1], want[j], rtol=1e-6)
        total += len(want[j])
    assert total <= cfg.TEST.DETECTIONS_PER_IM + c  # ties can exceed slightly
