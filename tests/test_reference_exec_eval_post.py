"""Golden parity against the *executed* reference eval post-processing.

Imports /root/reference/lib/core/test.py for real and compares its
box_results_with_nms_and_limit / box_results_for_corloc
(lib/core/test.py:320-423) against cim_tpu.engine.test on shared
fixtures. The cython NMS extension only ships as py36/py37 binaries, so
`utils.cython_nms`/`utils.cython_bbox` are stubbed with cim_tpu's host
kernels, whose own semantics (detectron +1 areas, `>=` suppression,
descending-score keep order) are pinned separately in tests/test_nms.py
and tests/test_native.py — what THIS module pins by reference execution
is everything around the NMS call: the per-class `> SCORE_THRESH`
gating, the over-all-classes DETECTIONS_PER_IM cap with its `>=
image_thresh` tie rule, the 1-offset class list assembly, and the
(reference-faithful) vstack over range(1, num_classes) that drops the
last class from the flat results while keeping it in cls_boxes.
"""
from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest

from cim_tpu.config import clone_cfg, get_default_cfg
from cim_tpu.engine.test import (
    box_results_for_corloc,
    box_results_with_nms_and_limit,
)
from cim_tpu.ops.nms import nms_np, soft_nms_np

REF_LIB = "/root/reference/lib"

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def ref_test():
    import torch  # noqa: F401  (core.test imports torch)

    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    class _ToTensor:
        def __call__(self, a):
            import torch as _t

            return _t.from_numpy(a.transpose(2, 0, 1).astype(np.float32) / 255.0)

    class _Normalize:
        def __init__(self, mean, std):
            import torch as _t

            self.mean = _t.tensor(mean).view(-1, 1, 1)
            self.std = _t.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class _Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    stub("torch._six", string_classes=str, int_classes=int)
    tr = types.ModuleType("torchvision.transforms")
    tr.ToTensor, tr.Normalize, tr.Compose = _ToTensor, _Normalize, _Compose
    tv = types.ModuleType("torchvision")
    tv.transforms = tr
    stubs["torchvision"] = tv
    stubs["torchvision.transforms"] = tr
    stub("pycocotools")
    stub("pycocotools.mask")
    stubs["pycocotools"].mask = stubs["pycocotools.mask"]
    # cython extensions: ship only as py36/37 binaries; cim_tpu's host
    # kernels stand in (their semantics pinned in test_nms/test_native)
    stub(
        "utils.cython_nms",
        nms=lambda dets, thresh: np.asarray(nms_np(dets, thresh), np.int64),
        soft_nms=soft_nms_np,
    )

    def _overlaps(boxes, query):
        from cim_tpu.ops.boxes import box_iou

        return np.asarray(
            box_iou(boxes.astype(np.float32), query.astype(np.float32),
                    legacy_plus_one=True)
        )

    stub("utils.cython_bbox", bbox_overlaps=_overlaps)

    had = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_LIB)
    try:
        for m in ("utils", "utils.timer", "utils.blob", "utils.boxes",
                  "utils.image", "core", "core.config"):
            importlib.import_module(m)
        mod = importlib.import_module("core.test")
    finally:
        sys.path.remove(REF_LIB)
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def _fixture(rng, n=300, c=20, peaked=12):
    scores = rng.gamma(0.3, 2e-4, size=(n, c)).astype(np.float32)
    for cls in rng.choice(c, 4, replace=False):
        hot = rng.choice(n, peaked, replace=False)
        scores[hot, cls] = rng.uniform(0.05, 0.95, peaked)
    x1 = rng.uniform(0, 400, n)
    y1 = rng.uniform(0, 300, n)
    boxes = np.stack(
        [x1, y1, x1 + rng.uniform(8, 100, n), y1 + rng.uniform(8, 100, n)], 1
    ).astype(np.float32)
    return scores, boxes


def _ref_cfg(ref_test, num_classes=20):
    rcfg = ref_test.cfg
    rcfg.immutable(False)
    rcfg.MODEL.NUM_CLASSES = num_classes
    rcfg.TEST.SCORE_THRESH = 1e-5
    rcfg.TEST.NMS = 0.3
    rcfg.TEST.DETECTIONS_PER_IM = 100
    rcfg.TEST.SOFT_NMS.ENABLED = False
    rcfg.TEST.BBOX_VOTE.ENABLED = False
    return rcfg


def _our_cfg(num_classes=20):
    cfg = clone_cfg(get_default_cfg())
    cfg.MODEL.NUM_CLASSES = num_classes
    cfg.TEST.SCORE_THRESH = 1e-5
    cfg.TEST.NMS = 0.3
    cfg.TEST.DETECTIONS_PER_IM = 100
    return cfg


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_box_results_with_nms_and_limit_parity(ref_test, seed):
    rng = np.random.RandomState(seed)
    scores, boxes = _fixture(rng)
    _ref_cfg(ref_test)
    want_s, want_b, want_cls = ref_test.box_results_with_nms_and_limit(
        scores.copy(), boxes.copy()
    )
    got_s, got_b, got_cls = box_results_with_nms_and_limit(
        _our_cfg(), scores.copy(), boxes.copy()
    )
    np.testing.assert_allclose(got_s, want_s, rtol=1e-6)
    np.testing.assert_allclose(got_b, want_b, rtol=1e-6)
    assert len(got_cls) == len(want_cls) == 21
    for j in range(1, 21):
        np.testing.assert_allclose(
            np.asarray(got_cls[j]).reshape(-1, 5),
            np.asarray(want_cls[j]).reshape(-1, 5),
            rtol=1e-6,
            err_msg=f"class {j}",
        )


def test_detections_per_im_cap_parity(ref_test):
    """More than 100 passing detections: the over-all-classes cap and its
    `>= image_thresh` tie rule must match exactly."""
    rng = np.random.RandomState(7)
    scores, boxes = _fixture(rng, n=600, peaked=40)
    _ref_cfg(ref_test)
    want_s, _, want_cls = ref_test.box_results_with_nms_and_limit(
        scores.copy(), boxes.copy()
    )
    got_s, _, got_cls = box_results_with_nms_and_limit(
        _our_cfg(), scores.copy(), boxes.copy()
    )
    assert sum(len(np.asarray(c).reshape(-1, 5)) for c in want_cls[1:]) <= 100 + 20
    np.testing.assert_allclose(got_s, want_s, rtol=1e-6)
    for j in range(1, 21):
        np.testing.assert_allclose(
            np.asarray(got_cls[j]).reshape(-1, 5),
            np.asarray(want_cls[j]).reshape(-1, 5), rtol=1e-6,
        )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_box_results_for_corloc_parity(ref_test, seed):
    rng = np.random.RandomState(30 + seed)
    scores, boxes = _fixture(rng, n=120)
    _ref_cfg(ref_test)
    want_s, want_b, want_cls = ref_test.box_results_for_corloc(
        scores.copy(), boxes.copy()
    )
    got_s, got_b, got_cls = box_results_for_corloc(
        _our_cfg(), scores.copy(), boxes.copy()
    )
    np.testing.assert_allclose(got_s, want_s, rtol=1e-6)
    np.testing.assert_allclose(got_b, want_b, rtol=1e-6)
    for j in range(1, 21):
        np.testing.assert_allclose(
            np.asarray(got_cls[j]).reshape(-1, 5),
            np.asarray(want_cls[j]).reshape(-1, 5), rtol=1e-6,
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_flip_and_convert_parity(ref_test, seed):
    """Executed utils.boxes pure helpers used by the TTA path: flip_boxes
    and xyxy<->xywh round trips (lib/utils/boxes.py)."""
    bu = sys.modules.get("_ref_boxes")
    # core.test imported utils.boxes under the reference lib; reach it
    # through the module object
    bu = ref_test.box_utils
    rng = np.random.RandomState(40 + seed)
    x1 = rng.uniform(0, 300, 50)
    y1 = rng.uniform(0, 200, 50)
    boxes = np.stack(
        [x1, y1, x1 + rng.uniform(5, 80, 50), y1 + rng.uniform(5, 80, 50)], 1
    ).astype(np.float32)

    from cim_tpu.ops.boxes import flip_boxes, xywh_to_xyxy, xyxy_to_xywh

    w = 500
    np.testing.assert_allclose(
        flip_boxes(boxes, w), bu.flip_boxes(boxes.copy(), w), rtol=1e-6
    )
    np.testing.assert_allclose(
        xyxy_to_xywh(boxes), bu.xyxy_to_xywh(boxes), rtol=1e-6
    )
    np.testing.assert_allclose(
        xywh_to_xyxy(bu.xyxy_to_xywh(boxes)),
        bu.xywh_to_xyxy(bu.xyxy_to_xywh(boxes)),
        rtol=1e-6,
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_bbox_transform_parity(ref_test, seed):
    """Executed utils.boxes.bbox_transform (lib/utils/boxes.py:156-197):
    delta application incl. the BBOX_XFORM_CLIP=log(1000/8) exp guard and
    the detectron +1/-1 width convention."""
    bu = ref_test.box_utils
    rng = np.random.RandomState(50 + seed)
    n = 64
    x1 = rng.uniform(0, 300, n)
    y1 = rng.uniform(0, 200, n)
    boxes = np.stack(
        [x1, y1, x1 + rng.uniform(5, 90, n), y1 + rng.uniform(5, 90, n)], 1
    ).astype(np.float32)
    deltas = rng.normal(0, 1.0, (n, 4)).astype(np.float32)
    deltas[:5, 2:] = 10.0  # exercise the exp clip

    from cim_tpu.ops.boxes import bbox_transform

    want = bu.bbox_transform(boxes.copy(), deltas.copy(), (1.0, 1.0, 1.0, 1.0))
    got = np.asarray(bbox_transform(boxes, deltas))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    w = (2.0, 1.5, 0.8, 1.2)
    np.testing.assert_allclose(
        np.asarray(bbox_transform(boxes, deltas, w)),
        bu.bbox_transform(boxes.copy(), deltas.copy(), w),
        rtol=1e-4, atol=1e-3,
    )


@pytest.mark.parametrize("method,beta", [
    ("ID", 1.0), ("TEMP_AVG", 0.7), ("AVG", 1.0), ("IOU_AVG", 1.0),
    ("GENERALIZED_AVG", 2.0), ("QUASI_SUM", 1.3),
])
def test_box_voting_parity(ref_test, method, beta):
    """Executed utils.boxes.box_voting (lib/utils/boxes.py:268-318), every
    scoring method. This caught a real transliteration bug: our TEMP_AVG
    had re-derived a logit-space formula where the reference temperature-
    smooths the (p, 1-p) distribution and returns a probability."""
    bu = ref_test.box_utils
    rng = np.random.RandomState(60)
    n_top, n_all = 12, 80
    x1 = rng.uniform(0, 200, n_all)
    y1 = rng.uniform(0, 150, n_all)
    all_dets = np.concatenate(
        [
            np.stack([x1, y1, x1 + rng.uniform(20, 80, n_all),
                      y1 + rng.uniform(20, 80, n_all)], 1),
            rng.uniform(0.05, 0.95, (n_all, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    top_dets = all_dets[rng.choice(n_all, n_top, replace=False)].copy()

    from cim_tpu.ops.boxes import box_voting_np

    want = bu.box_voting(top_dets.copy(), all_dets.copy(), 0.5, method, beta)
    got = box_voting_np(top_dets.copy(), all_dets.copy(), 0.5, method, beta)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_clip_and_aspect_parity(ref_test):
    """Executed utils.boxes clip_boxes_to_image / aspect_ratio."""
    bu = ref_test.box_utils
    rng = np.random.RandomState(70)
    n = 40
    boxes = rng.uniform(-50, 450, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:] - boxes[:, :2])

    from cim_tpu.ops.boxes import aspect_ratio, clip_boxes

    want = bu.clip_boxes_to_image(boxes.copy(), 300, 400)
    got = np.asarray(clip_boxes(boxes, 300, 400))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    np.testing.assert_allclose(
        np.asarray(aspect_ratio(boxes, 0.75)),
        bu.aspect_ratio(boxes.copy(), 0.75),
        rtol=1e-6,
    )
