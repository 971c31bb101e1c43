"""Golden parity against the *executed* reference mask-results post.

/root/reference/lib/utils/mask_eval_utils.py is imported and run for
real as the oracle for cim_tpu.evaluation.mask_results. Its two entry
points differ from core/test.py's box post in load-bearing ways this
pins by execution: the class loop INCLUDES index 0 (range(num_classes),
mask_eval_utils.py:12) before the whole list is shifted one slot
(:38-47), masks / original-proposal indices ride through NMS and the
DETECTIONS_PER_IM cap alongside the boxes, and the cap's `>=
image_thresh` tie rule applies to both.

Stub set matches tests/test_reference_exec_eval_post.py: the py36-only
cython NMS binaries stand in via cim_tpu's host kernels (their own
semantics pinned in tests/test_nms.py / test_native.py);
pycocotools.mask.encode is bound to cim_tpu.evaluation.rle.encode for
the module-level coco_encode import (RLE semantics pinned separately by
the COCOeval fuzz + pycocotools-format goldens in tests/test_poly_rle.py).
"""
from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest

from cim_tpu.config import clone_cfg, get_default_cfg
from cim_tpu.evaluation.mask_results import (
    mask_results_with_nms_and_limit,
    mask_results_with_nms_and_limit_get_index,
)
from cim_tpu.ops.nms import nms_np, soft_nms_np

REF_LIB = "/root/reference/lib"


@pytest.fixture(scope="module")
def ref_mod():
    from cim_tpu.evaluation import rle

    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    stub("torch._six", string_classes=str, int_classes=int)
    stub(
        "utils.cython_nms",
        nms=lambda dets, thresh: np.asarray(nms_np(dets, thresh), np.int64),
        soft_nms=soft_nms_np,
    )

    def _overlaps(b, q):
        from cim_tpu.ops.boxes import box_iou

        return np.asarray(
            box_iou(b.astype(np.float32), q.astype(np.float32),
                    legacy_plus_one=True)
        )

    stub("utils.cython_bbox", bbox_overlaps=_overlaps)

    def _encode(fortran_mask):
        # pycocotools returns bytes counts; the reference decodes utf-8
        d = dict(rle.encode(np.asarray(fortran_mask)))
        d["counts"] = d["counts"].encode("utf-8")
        return d

    stub("pycocotools")
    stub("pycocotools.mask", encode=_encode)
    stubs["pycocotools"].mask = stubs["pycocotools.mask"]

    had = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_LIB)
    try:
        mod = importlib.import_module("utils.mask_eval_utils")
    finally:
        sys.path.remove(REF_LIB)
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def _cfgs(num_classes=21, det_per_im=25):
    """Reference call sites pass cfg with NUM_CLASSES = C+1 slots here
    (tools/evaluation.py feeds bg-inclusive score matrices)."""
    cfg = clone_cfg(get_default_cfg())
    cfg.MODEL.NUM_CLASSES = num_classes
    cfg.TEST.SCORE_THRESH = 1e-5
    cfg.TEST.NMS = 0.3
    cfg.TEST.DETECTIONS_PER_IM = det_per_im
    ref_cfg = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(NUM_CLASSES=num_classes),
        TEST=types.SimpleNamespace(
            SCORE_THRESH=1e-5, NMS=0.3, DETECTIONS_PER_IM=det_per_im
        ),
    )
    return cfg, ref_cfg


def _fixture(seed, n=160, c=21):
    rng = np.random.RandomState(seed)
    scores = rng.gamma(0.3, 2e-4, size=(n, c)).astype(np.float32)
    for cls in rng.choice(c, 6, replace=False):
        hot = rng.choice(n, 10, replace=False)
        scores[hot, cls] = rng.uniform(0.05, 0.95, 10)
    # duplicated boxes create NMS score ties across classes
    x1 = rng.uniform(0, 300, n)
    y1 = rng.uniform(0, 200, n)
    boxes = np.stack(
        [x1, y1, x1 + rng.uniform(8, 90, n), y1 + rng.uniform(8, 90, n)], 1
    ).astype(np.float32)
    masks = (rng.rand(n, 49) > 0.5).astype(np.float32)
    return scores, boxes, masks


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mask_results_parity(ref_mod, seed):
    scores, boxes, masks = _fixture(seed)
    cfg, ref_cfg = _cfgs()
    want_s, want_b, want_cls, want_m = ref_mod.mask_results_with_nms_and_limit(
        ref_cfg, scores.copy(), boxes.copy(), masks.copy()
    )
    got_s, got_b, got_cls, got_m = mask_results_with_nms_and_limit(
        cfg, scores.copy(), boxes.copy(), masks.copy()
    )
    np.testing.assert_allclose(got_s, want_s, rtol=1e-6)
    np.testing.assert_allclose(got_b, want_b, rtol=1e-6)
    for j in range(1, 22):
        np.testing.assert_allclose(
            np.asarray(got_cls[j]).reshape(-1, 5),
            np.asarray(want_cls[j]).reshape(-1, 5),
            rtol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(got_m[j]).reshape(-1, 49),
            np.asarray(want_m[j]).reshape(-1, 49),
        )


@pytest.mark.parametrize("seed", [3, 4])
@pytest.mark.parametrize("det_per_im", [25, 0])
def test_mask_results_get_index_parity(ref_mod, seed, det_per_im):
    """The index-tracking variant feeds the full-res COB .mat reload path
    (tools/evaluation.py): original proposal row indices must survive
    per-class NMS and the over-all-classes cap identically."""
    scores, boxes, _ = _fixture(seed)
    cfg, ref_cfg = _cfgs(det_per_im=det_per_im)
    want = ref_mod.mask_results_with_nms_and_limit_get_index(
        ref_cfg, scores.copy(), boxes.copy(), DETECTIONS_PER_IM=det_per_im
    )
    got = mask_results_with_nms_and_limit_get_index(
        cfg, scores.copy(), boxes.copy(), detections_per_im=det_per_im
    )
    np.testing.assert_allclose(got[0], want[0], rtol=1e-6)
    np.testing.assert_allclose(got[1], want[1], rtol=1e-6)
    for j in range(1, 22):
        np.testing.assert_allclose(
            np.asarray(got[2][j]).reshape(-1, 5),
            np.asarray(want[2][j]).reshape(-1, 5),
            rtol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(got[3][j], dtype=np.int64).reshape(-1),
            np.asarray(want[3][j], dtype=np.int64).reshape(-1),
        )


def test_coco_encode_contract(ref_mod):
    """ref coco_encode (pycocotools encode + utf-8 counts decode,
    mask_eval_utils.py:112-116) vs ours, with the RLE codec shared —
    pins the fortran-order + string-counts plumbing contract."""
    rng = np.random.RandomState(9)
    mask = (rng.rand(37, 23) > 0.6).astype(np.uint8)
    want = ref_mod.coco_encode(np.asfortranarray(mask))
    from cim_tpu.evaluation.mask_results import coco_encode

    got = coco_encode(mask)
    assert got["size"] == list(want["size"]) or tuple(got["size"]) == tuple(want["size"])
    assert got["counts"] == want["counts"]
    assert isinstance(got["counts"], str)
