import numpy as np

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cim_tpu.data.synthetic import synthetic_masks
from tools.pre.AGPL_label_assign import assign_image
from tools.pre.point_level_label_assign import assign_from_points


def test_assign_image_clusters(rng):
    masks, _ = synthetic_masks(rng, 30, 56, 56)
    # two fake peaks inside known masks; CRM space = 112 (2x the 56 grid)
    ys, xs = np.nonzero(masks[0])
    p0 = (ys[0] * 2, xs[0] * 2, 3)
    ys, xs = np.nonzero(masks[5])
    p1 = (ys[-1] * 2, xs[-1] * 2, 7)
    peaks = np.zeros((64, 3), np.int32)
    peaks[0] = p0
    peaks[1] = p1
    scores = np.zeros(64, np.float32)
    scores[:2] = [0.9, 0.5]

    la = assign_image(masks, peaks, scores, 2, num_classes=20, crm_size=112)
    assert la.shape == (30, 21)
    # at least one proposal assigned to each peak's class OR zero (if the
    # avg-supermask IoU gate filtered), and the cluster ids are distinct
    cids = np.unique(la[la > 0])
    assert len(cids) >= 1
    # a proposal can hold at most one cluster label
    assert (np.count_nonzero(la, axis=1) <= 1).all()


def test_assign_image_no_peaks_all_background(rng):
    masks, _ = synthetic_masks(rng, 10, 28, 28)
    la = assign_image(masks, np.zeros((64, 3), np.int32),
                      np.zeros(64, np.float32), 0, num_classes=20)
    assert (la[:, 0] == 1).all()
    assert la[:, 1:].sum() == 0


def test_assign_from_points_matches_agpl_rule(rng):
    masks, _ = synthetic_masks(rng, 25, 40, 40)
    ys, xs = np.nonzero(masks[3])
    points = [(float(xs[0]), float(ys[0]), 5, 1.0)]
    la = assign_from_points(masks, points, num_classes=20)
    assert la.shape == (25, 21)
    assigned = np.nonzero(la[:, 6])[0]
    # proposal 3 itself should be assigned (IoU with its own supermask high)
    if len(assigned):
        assert (np.count_nonzero(la, axis=1) <= 1).all()


def test_dead_peak_or_point_still_advances_cluster_index(rng):
    """A peak/point covered by NO proposal assigns nothing but still
    advances the cluster index (reference mean-of-empty -> all-False
    supermask, AGPL_label_assign.py:158-177 — pinned by execution in
    tests/test_reference_exec_label_assign.py), so the bg cluster id
    matches reference-generated mats exactly."""
    import numpy as np

    from tools.pre.AGPL_label_assign import assign_image
    from tools.pre.point_level_label_assign import assign_from_points

    masks = np.zeros((4, 32, 32), bool)
    masks[0, 2:12, 2:12] = True
    masks[1, 3:13, 3:13] = True
    masks[2, 20:30, 20:30] = True
    masks[3, 18:28, 18:28] = True

    # AGPL: peak 1 lands in the first group, peak 2 lands on bare pixels
    peaks = np.array([[7 * 112 // 32, 7 * 112 // 32, 2],
                      [15 * 112 // 32, 15 * 112 // 32, 5]], np.int64)
    la = assign_image(masks, peaks, np.array([0.9, 0.8], np.float32),
                      num_peaks=2, num_classes=20, crm_size=112)
    # ascending-score order: the DEAD peak (0.8) consumes cluster 1,
    # the live assignment gets cluster 2, bg gets 3
    assert la[:, 3].max() == 2           # class 2 -> column 3
    if (la[:, 0] != 0).any():
        assert la[:, 0].max() == 3

    # point path: file order (no sort) — live point first
    points = [(7, 7, 2, 1.0), (15, 15, 5, 1.0)]
    lp = assign_from_points(masks, points, num_classes=20)
    assert lp[:, 3].max() == 1
    if (lp[:, 0] != 0).any():
        assert lp[:, 0].max() == 3
