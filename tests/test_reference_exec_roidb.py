"""Golden parity against the *executed* reference data layer.

/root/reference/lib/datasets/json_dataset.py (roidb construction:
multi-hot image-level gt_classes, gt_boxes with contiguous class ids,
proposal/mat pkl ingestion with id-sorting and clipping) and roidb.py
(flip augmentation, positive-class filter) run for REAL over a shared
on-disk synthetic dataset, and their output entries are field-compared
against cim_tpu.data.{json_dataset,roidb} on the same files.

Stubs required to import the reference modules: pycocotools.coco.COCO
is bound to cim_tpu.evaluation.coco.COCO (API-compatible; its own
semantics are validated by the COCOeval brute-force fuzz),
pycocotools.mask is imported-but-unused, and the py36-only cython
extensions stand in via cim_tpu's host kernels. cfg.DEBUG=True routes
around the reference's on-disk gt cache.
"""
from __future__ import annotations

import importlib
import json
import pickle
import sys
import types

import numpy as np
import pytest

REF_LIB = "/root/reference/lib"

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def ref_mods():
    import torch  # noqa: F401

    from cim_tpu.evaluation.coco import COCO as OurCOCO
    from cim_tpu.ops.boxes import box_iou
    from cim_tpu.ops.nms import nms_np, soft_nms_np

    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    stub("torch._six", string_classes=str, int_classes=int)
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.ToTensor = tr.Normalize = tr.Compose = object
    tv.transforms = tr
    stubs["torchvision"], stubs["torchvision.transforms"] = tv, tr
    stub("pycocotools")
    stub("pycocotools.mask")
    coco_mod = types.ModuleType("pycocotools.coco")
    coco_mod.COCO = OurCOCO
    stubs["pycocotools.coco"] = coco_mod
    stubs["pycocotools"].coco = coco_mod
    stubs["pycocotools"].mask = stubs["pycocotools.mask"]
    stub(
        "utils.cython_nms",
        nms=lambda dets, thresh: np.asarray(nms_np(dets, thresh), np.int64),
        soft_nms=soft_nms_np,
    )
    stub(
        "utils.cython_bbox",
        bbox_overlaps=lambda b, q: np.asarray(
            box_iou(b.astype(np.float32), q.astype(np.float32),
                    legacy_plus_one=True)
        ),
    )

    had = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_LIB)
    try:
        jd = importlib.import_module("datasets.json_dataset")
        rd = importlib.import_module("datasets.roidb")
        cat = importlib.import_module("datasets.dataset_catalog")
        cfg_mod = importlib.import_module("core.config")
    finally:
        sys.path.remove(REF_LIB)
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return jd, rd, cat, cfg_mod


@pytest.fixture(scope="module")
def disk_ds(tmp_path_factory):
    """Synthetic VOC-like dataset on disk (images, COCO json, proposal +
    label-assign pkls) shared by both implementations."""
    rng = np.random.RandomState(5)
    root = tmp_path_factory.mktemp("refroidb")
    img_dir = root / "imgs"
    img_dir.mkdir()
    n_images, ncls = 5, 20
    images, annotations = [], []
    prop = {"indexes": [], "boxes": [], "masks": [], "scores": []}
    mats = {"indexes": [], "mat": []}
    aid = 1
    # deliberately UNSORTED proposal ids to exercise _sort_proposals
    order = [3, 1, 5, 2, 4]
    for i in range(n_images):
        h, w = 96, 128
        name = f"{i:06d}"
        cv2.imwrite(str(img_dir / f"{name}.jpg"),
                    (rng.rand(h, w, 3) * 255).astype(np.uint8))
        images.append({"id": i + 1, "width": w, "height": h,
                       "file_name": f"{name}.jpg"})
        n_props = int(rng.randint(12, 20))
        boxes = rng.uniform(0, 100, (n_props, 4)).astype(np.float32)
        boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 60, (n_props, 2))
        # some boxes poke past the image edge -> clipping is exercised
        for cat_id in rng.choice(ncls, 2, replace=False) + 1:
            x1, y1 = rng.randint(0, 60), rng.randint(0, 50)
            bw, bh = rng.randint(10, 60), rng.randint(10, 40)
            annotations.append({
                "id": aid, "image_id": i + 1, "category_id": int(cat_id),
                "bbox": [float(x1), float(y1), float(bw), float(bh)],
                "segmentation": [[x1, y1, x1 + bw, y1, x1 + bw, y1 + bh,
                                  x1, y1 + bh]],
                "area": float(bw * bh), "iscrowd": 0,
            })
            aid += 1
    for i in order:
        idx = i - 1
        n_props = 12 + idx  # varies per image
        boxes = rng.uniform(0, 120, (n_props, 4)).astype(np.float32)
        boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 60, (n_props, 2))
        prop["indexes"].append(i)
        prop["boxes"].append(boxes)
        prop["masks"].append(
            (rng.rand(n_props, 7, 7) > 0.5).astype(np.float32)
        )
        prop["scores"].append(rng.rand(n_props).astype(np.float32))
        mats["indexes"].append(i)
        m = np.zeros((n_props, ncls + 1), np.float32)
        m[0, int(rng.randint(1, ncls + 1))] = 1
        mats["mat"].append(m)
    (root / "ann.json").write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": c + 1, "name": f"c{c}"} for c in range(ncls)],
    }))
    with open(root / "props.pkl", "wb") as f:
        pickle.dump(prop, f)
    with open(root / "mats.pkl", "wb") as f:
        pickle.dump(mats, f)
    return root


def _build_reference_roidb(ref_mods, disk_ds, flipped=False):
    jd, rd, cat, cfg_mod = ref_mods
    rcfg = cfg_mod.cfg
    rcfg.immutable(False)
    rcfg.DEBUG = True  # bypass the gt cache (json_dataset.py:128-150)
    rcfg.DATA_DIR = str(disk_ds)
    rcfg.FAST_RCNN.MASK_SIZE = 7
    rcfg.TRAIN.GT_MIN_AREA = -1
    cat.DATASETS["synth_ref"] = {
        cat.IM_DIR: str(disk_ds / "imgs"),
        cat.ANN_FN: str(disk_ds / "ann.json"),
    }
    ds = jd.JsonDataset("synth_ref")
    roidb = ds.get_roidb(
        gt=True,
        proposal_file=str(disk_ds / "props.pkl"),
        mat_file=str(disk_ds / "mats.pkl"),
    )
    if flipped:
        rd.extend_with_flipped_entries(roidb, ds)
        roidb = rd.filter_for_training(roidb)
    return roidb


def _build_our_roidb(disk_ds, flipped=False):
    import os

    from cim_tpu.config import clone_cfg, get_default_cfg
    from cim_tpu.data import roidb as rdb
    from cim_tpu.data.json_dataset import JsonDataset

    cfg = clone_cfg(get_default_cfg())
    cfg.DATA_DIR = str(disk_ds)
    os.environ["CIM_TPU_NO_CACHE"] = "1"
    from cim_tpu.data import catalog

    catalog.register_dataset("synth_ours", {
        "image_directory": str(disk_ds / "imgs"),
        "annotation_file": str(disk_ds / "ann.json"),
    })
    ds = JsonDataset(cfg, "synth_ours")
    roidb = ds.get_roidb(
        gt=True,
        proposal_file=str(disk_ds / "props.pkl"),
        mat_file=str(disk_ds / "mats.pkl"),
    )
    if flipped:
        rdb.extend_with_flipped_entries(roidb)
        roidb = rdb.filter_for_training(roidb)
    return roidb


@pytest.mark.parametrize("flipped", [False, True])
def test_roidb_construction_parity(ref_mods, disk_ds, flipped):
    want = _build_reference_roidb(ref_mods, disk_ds, flipped)
    got = _build_our_roidb(disk_ds, flipped)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["id"] == w["id"]
        assert g["flipped"] == w["flipped"]
        assert g["image"] == w["image"]
        np.testing.assert_allclose(g["boxes"], w["boxes"], atol=1e-5,
                                   err_msg=f"boxes id={w['id']}")
        np.testing.assert_array_equal(
            np.asarray(g["gt_classes"]).reshape(-1),
            np.asarray(w["gt_classes"]).reshape(-1),
        )
        np.testing.assert_allclose(g["masks"], w["masks"], atol=1e-6)
        np.testing.assert_allclose(g["mat"], w["mat"], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g["gt_boxes"], np.float32).reshape(-1, 5),
            np.asarray(w["gt_boxes"], np.float32).reshape(-1, 5),
            atol=1e-5,
        )


def test_proposal_id_mismatch_raises(ref_mods, disk_ds, tmp_path):
    """Both sides must refuse a proposal file whose ids do not match the
    image ids (the reference's sanity check, json_dataset.py:244-250)."""
    with open(disk_ds / "props.pkl", "rb") as f:
        prop = pickle.load(f)
    prop["indexes"] = [i + 100 for i in prop["indexes"]]
    bad = tmp_path / "bad_props.pkl"
    with open(bad, "wb") as f:
        pickle.dump(prop, f)

    jd, rd, cat, cfg_mod = ref_mods
    ds_ref = jd.JsonDataset("synth_ref")
    with pytest.raises(AssertionError):
        ds_ref.get_roidb(gt=True, proposal_file=str(bad))

    from cim_tpu.config import clone_cfg, get_default_cfg
    from cim_tpu.data.json_dataset import JsonDataset

    cfg = clone_cfg(get_default_cfg())
    cfg.DATA_DIR = str(disk_ds)
    ds = JsonDataset(cfg, "synth_ours")
    with pytest.raises(AssertionError):
        ds.get_roidb(gt=True, proposal_file=str(bad))
