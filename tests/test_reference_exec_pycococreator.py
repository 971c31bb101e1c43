"""Golden parity against the *executed* reference pseudo-label formatter.

/root/reference/lib/datasets/pycococreatortools.py
create_annotation_info_v1 (the function generate_mask_for_MaskRCNN.py
calls for every exported instance, :156,170,185) runs for real as the
oracle for tools/generate_mask_for_MaskRCNN.create_annotation_info on
shared masks: ids, category, area, integer bbox, score, width/height
orientation, and the segmentation itself decoded back to the identical
binary mask.

Known deliberate deviation (asserted here, not hidden): the reference
emits *uncompressed* RLE ({'counts': [runs...]}) while we emit
compressed pycocotools-string RLE — both are valid COCO segmentation
encodings of the same mask and both are accepted by the downstream
mmdetection consumer; the test decodes each and requires pixel
equality.

Import shims: pycocotools.mask is bound to cim_tpu.evaluation.rle
(encode/area/toBbox — RLE semantics pinned against pycocotools-format
goldens in tests/test_poly_rle.py and the COCOeval fuzz);
skimage.measure is stubbed (only binary_mask_to_polygon uses it, which
the _v1 path never calls).
"""
from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest

REF_LIB = "/root/reference/lib"


@pytest.fixture(scope="module")
def ref_pct():
    from cim_tpu.evaluation import rle

    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    def _encode(fmask):
        return dict(rle.encode(np.asarray(fmask)))

    stub(
        "pycocotools",
    )
    stub(
        "pycocotools.mask",
        encode=_encode,
        area=lambda r: np.asarray(rle.area(r)),
        toBbox=lambda r: np.asarray(rle.to_bbox(r), np.float64),
    )
    stubs["pycocotools"].mask = stubs["pycocotools.mask"]
    sk = types.ModuleType("skimage")
    skm = types.ModuleType("skimage.measure")
    skm.find_contours = skm.approximate_polygon = None
    sk.measure = skm
    stubs["skimage"] = sk
    stubs["skimage.measure"] = skm

    had = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_LIB)
    try:
        mod = importlib.import_module("datasets.pycococreatortools")
    finally:
        sys.path.remove(REF_LIB)
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def _decode_uncompressed(rle_dict):
    h, w = rle_dict["size"]
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for run in rle_dict["counts"]:
        flat[pos : pos + run] = val
        pos += run
        val = 1 - val
    return flat.reshape((w, h)).T  # column-major


def _decode_ours(seg):
    from cim_tpu.evaluation import rle

    return rle.decode(seg)


def _blob_mask(rng, h, w):
    m = np.zeros((h, w), np.uint8)
    for _ in range(3):
        cy, cx = rng.randint(0, h), rng.randint(0, w)
        r = rng.randint(3, 9)
        yy, xx = np.mgrid[0:h, 0:w]
        m |= ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)
    return m


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_annotation_info_parity(ref_pct, seed):
    sys.path.insert(0, "/root/repo/tools")
    try:
        from generate_mask_for_MaskRCNN import create_annotation_info
    finally:
        sys.path.remove("/root/repo/tools")

    rng = np.random.RandomState(seed)
    h, w = 43, 61
    mask = _blob_mask(rng, h, w)
    want = ref_pct.create_annotation_info_v1(
        7, 123, {"id": 15, "is_crowd": 0}, mask.astype(bool), score=0.625
    )
    got = create_annotation_info(7, 123, 15, mask, 0.625, (w, h))

    assert got["id"] == want["id"] and got["image_id"] == want["image_id"]
    assert got["category_id"] == want["category_id"]
    assert got["iscrowd"] == want["iscrowd"] == 0
    assert int(got["area"]) == int(np.asarray(want["area"]))
    assert [int(v) for v in got["bbox"]] == want["bbox"]
    assert got["score"] == pytest.approx(want["score"])
    assert (got["width"], got["height"]) == (want["width"], want["height"])
    np.testing.assert_array_equal(
        _decode_ours(got["segmentation"]),
        _decode_uncompressed(want["segmentation"]),
    )


def test_annotation_info_empty_mask_returns_none(ref_pct):
    sys.path.insert(0, "/root/repo/tools")
    try:
        from generate_mask_for_MaskRCNN import create_annotation_info
    finally:
        sys.path.remove("/root/repo/tools")

    empty = np.zeros((20, 30), np.uint8)
    assert ref_pct.create_annotation_info_v1(
        1, 1, {"id": 1, "is_crowd": 0}, empty.astype(bool), score=0.5
    ) is None
    assert create_annotation_info(1, 1, 1, empty, 0.5, (30, 20)) is None


def test_image_info_parity(ref_pct):
    sys.path.insert(0, "/root/repo/tools")
    try:
        from generate_mask_for_MaskRCNN import create_image_info
    finally:
        sys.path.remove("/root/repo/tools")

    want = ref_pct.create_image_info(5, "img.jpg", (64, 48))
    got = create_image_info(5, "img.jpg", (64, 48))
    for k in ("id", "file_name", "width", "height"):
        assert got[k] == want[k]
