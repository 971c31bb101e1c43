"""Golden parity against the *executed* reference 7x7 proposal rasterizer.

/root/reference/tools/pre/generate_7_7_voc.py generate_pkl_voc2012 runs
for REAL over fixture COB .mat files (object-array `maskmat`, the
production on-disk format) and its output pkl is the oracle for
tools/pre/generate_7_7.rasterize_one. This is the root of the whole
data pipeline: every training/eval mask is one of these 7x7 crops and
every proposal box comes out of this loop, so the PIL-NEAREST resample
grid, the tight-bbox extraction, and the box convention must match
exactly.

This test drove a real fix: our generator originally stored
inclusive-max boxes ([.., xmax, ymax]) and invented linspace scores; the
reference stores EXCLUSIVE-max ([.., xmax+1, ymax+1] uint16,
generate_7_7_voc.py:36-40) and zero scores — and since the downstream
clip (json_dataset.py:252) only trims border-touching boxes, interior
training boxes genuinely carry the +1.

Shims: pycocotools.coco stub (module-level import, unused by the
function), tqdm passthrough, the removed np.bool alias for the
`dtype=np.bool` at :32, module globals mask_size/trash injected (the
reference defines them under __main__ only), cwd pinned to a tmp tree
mirroring ./data paths.
"""
from __future__ import annotations

import importlib.util
import os
import pickle
import sys
import types

import numpy as np
import pytest
from scipy.io import savemat

REF_PRE = "/root/reference/tools/pre"

IMG_ID = 20070001  # -> file 2007_0001.mat


def _blobby_masks(rng, n, h, w):
    masks = []
    for _ in range(n):
        m = np.zeros((h, w), np.uint8)
        for _ in range(2):
            cy, cx = rng.randint(3, h - 3), rng.randint(3, w - 3)
            r = rng.randint(2, min(h, w) // 3)
            yy, xx = np.mgrid[0:h, 0:w]
            m |= ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)
        masks.append(m)
    return masks


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("gen77")
    cob = root / "data" / "VOC2012" / "COB_SBD_trainaug"
    cob.mkdir(parents=True)
    (root / "data" / "VOC2012" / "COB_SBD_val").mkdir(parents=True)
    (root / "data" / "trash").mkdir(parents=True)
    rng = np.random.RandomState(11)
    masks = _blobby_masks(rng, 6, 48, 64)
    obj = np.empty((len(masks), 1), dtype=object)
    for i, m in enumerate(masks):
        obj[i, 0] = m
    savemat(str(cob / "2007_0001.mat"), {"maskmat": obj})
    return root, cob, masks


@pytest.fixture(scope="module")
def ref_gen():
    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    stub("pycocotools")
    coco_mod = types.ModuleType("pycocotools.coco")
    coco_mod.COCO = object
    stubs["pycocotools.coco"] = coco_mod
    stubs["pycocotools"].coco = coco_mod

    had = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_PRE)  # for `from pre_tools import *`
    added_bool = not hasattr(np, "bool")
    if added_bool:
        np.bool = bool  # pre-1.24 alias used at generate_7_7_voc.py:32
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_gen77", os.path.join(REF_PRE, "generate_7_7_voc.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF_PRE)
        if added_bool:
            del np.bool
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def test_rasterizer_matches_executed_reference(ref_gen, fixture_tree, monkeypatch):
    root, cob, masks = fixture_tree
    monkeypatch.chdir(root)  # the reference uses ./data relative paths
    ref_gen.mask_size = 7  # __main__-only globals the function reads
    ref_gen.trash = str(root / "data" / "trash")

    added_bool = not hasattr(np, "bool")
    if added_bool:
        np.bool = bool
    try:
        ref_gen.generate_pkl_voc2012([IMG_ID], worker_id=0)
    finally:
        if added_bool:
            del np.bool
    with open(root / "data" / "trash" / "voc_0.pkl", "rb") as f:
        want = pickle.load(f)

    sys.path.insert(0, "/root/repo/tools/pre")
    try:
        from generate_7_7 import rasterize_one
    finally:
        sys.path.remove("/root/repo/tools/pre")
    img_id, boxes, small, scores = rasterize_one((IMG_ID, str(cob), "voc", 7))

    assert want["indexes"] == [IMG_ID] and img_id == IMG_ID
    want_boxes = want["boxes"][0]
    assert want_boxes.dtype == boxes.dtype == np.uint16
    np.testing.assert_array_equal(boxes, want_boxes)
    # the exclusive-max convention: x2 = xmax+1 (generate_7_7_voc.py:36)
    ys, xs = np.nonzero(masks[0])
    assert tuple(boxes[0]) == (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
    np.testing.assert_array_equal(small, want["masks"][0])
    np.testing.assert_array_equal(scores, want["scores"][0])
