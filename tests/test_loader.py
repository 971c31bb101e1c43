"""Host pipeline tests: fixed-shape microbatch construction + the
bucket-grouped stacked loader, on synthetic roidb entries with inline
IoU maps."""
import numpy as np
import pytest

from cim_tpu.config import clone_cfg, load_cfg
from cim_tpu.data.loader import TrainLoader, build_microbatch, _bucket_hw
from cim_tpu.data.synthetic import mask_matrices, masks_to_7x7, synthetic_masks

import os

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _entry(rng, h=96, w=128, n=30, num_classes=20):
    masks, boxes = synthetic_masks(rng, n, h, w)
    iou, asy = mask_matrices(masks)
    gt = np.zeros((1, num_classes), np.int32)
    gt[0, rng.choice(num_classes, 2, replace=False)] = 1
    return {
        "id": 1,
        "image": "/nonexistent/fake.jpg",
        "height": h,
        "width": w,
        "flipped": False,
        "boxes": boxes.astype(np.float32),
        "masks": masks_to_7x7(masks, boxes).astype(np.float32),
        "gt_classes": gt,
        "gt_boxes": np.zeros((0, 5), np.float32),
        "mat": np.zeros((n, num_classes + 1), np.float32),
        "iou_map": iou,
        "asy_iou_map": asy,
    }


def _cfg():
    cfg = clone_cfg(load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml")))
    cfg.TPU.PROPOSAL_PAD = 40
    return cfg


def test_build_microbatch_shapes_and_scaling(rng):
    cfg = _cfg()
    entry = _entry(rng)
    image = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
    scale = 0.5
    bucket = _bucket_hw(48, 64)
    mb = build_microbatch(cfg, entry, scale, bucket, rng, image=image)
    assert mb["image"].shape == (128, 128, 3)  # padded to 128-multiples
    assert mb["rois"].shape == (40, 4)
    assert mb["valid"].sum() == 30
    # rois scaled to image scale
    np.testing.assert_allclose(
        mb["rois"][:30], entry["boxes"] * scale, rtol=1e-5
    )
    assert mb["iou_map"].dtype == np.float16
    # iou matrix subset matches the entry's
    np.testing.assert_allclose(
        mb["iou_map"][:30, :30], entry["iou_map"].astype(np.float16)
    )


def test_build_microbatch_caps_proposals(rng):
    cfg = _cfg()
    cfg.TPU.PROPOSAL_PAD = 16
    entry = _entry(rng, n=30)
    image = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
    mb = build_microbatch(cfg, entry, 1.0, _bucket_hw(96, 128), rng, image=image)
    assert mb["valid"].sum() == 16
    # subsampling is consistent: the iou matrix diagonal stays 1
    np.testing.assert_allclose(np.diag(mb["iou_map"][:16, :16]), 1.0, atol=2e-3)


def test_train_loader_stacks_same_bucket(rng):
    cfg = _cfg()
    cfg.TRAIN.SCALES = (128,)
    entries = [_entry(rng) for _ in range(8)]
    for i, e in enumerate(entries):
        e["id"] = i + 1

    # patch image reading: loader needs cv2.imread; inject via monkey image
    import cim_tpu.data.loader as loader_mod

    orig = loader_mod.build_microbatch

    def fake_mb(cfg_, entry, s, bucket, rng_, image=None, **kw):
        img = (np.random.RandomState(entry["id"]).rand(
            entry["height"], entry["width"], 3) * 255).astype(np.uint8)
        return orig(cfg_, entry, s, bucket, rng_, image=img, **kw)

    loader_mod.build_microbatch = fake_mb
    try:
        loader = TrainLoader(cfg, entries, n_devices=2, grad_accum=2, seed=0)
        it = iter(loader)
        batch = next(it)
        loader.close()
    finally:
        loader_mod.build_microbatch = orig

    assert batch["image"].shape[:2] == (2, 2)
    assert batch["rois"].shape == (2, 2, 40, 4)
    assert batch["valid"].dtype == bool


def test_proposal_bucket_selection():
    from cim_tpu.data.loader import proposal_bucket

    cfg = _cfg()
    cfg.TPU.PROPOSAL_PAD = 4096
    cfg.TPU.PROPOSAL_BUCKETS = (1024, 2048, 4096)
    assert proposal_bucket(cfg, 500) == 1024
    assert proposal_bucket(cfg, 1024) == 1024
    assert proposal_bucket(cfg, 1500) == 2048
    assert proposal_bucket(cfg, 3000) == 4096
    assert proposal_bucket(cfg, 9000) == 4096  # capped
    cfg.TPU.PROPOSAL_BUCKETS = ()
    assert proposal_bucket(cfg, 500) == 4096  # single flat bucket
    cfg.TPU.PROPOSAL_PAD = 40  # cap below every bucket
    cfg.TPU.PROPOSAL_BUCKETS = (1024, 2048, 4096)
    assert proposal_bucket(cfg, 30) == 40


def test_train_loader_groups_by_proposal_bucket(rng):
    """Images with different proposal counts land in different compiled
    shapes; a group only fills from same-bucket images."""
    cfg = _cfg()
    cfg.TRAIN.SCALES = (128,)
    cfg.TPU.PROPOSAL_PAD = 64
    cfg.TPU.PROPOSAL_BUCKETS = (32, 64)
    entries = [_entry(rng, n=(20 if i % 2 == 0 else 50)) for i in range(8)]
    for i, e in enumerate(entries):
        e["id"] = i + 1

    import cim_tpu.data.loader as loader_mod

    orig = loader_mod.build_microbatch

    def fake_mb(cfg_, entry, s, bucket, rng_, image=None, **kw):
        img = (np.random.RandomState(entry["id"]).rand(
            entry["height"], entry["width"], 3) * 255).astype(np.uint8)
        return orig(cfg_, entry, s, bucket, rng_, image=img, **kw)

    loader_mod.build_microbatch = fake_mb
    try:
        loader = TrainLoader(cfg, entries, n_devices=1, grad_accum=2, seed=0)
        it = iter(loader)
        shapes = {next(it)["rois"].shape[2] for _ in range(4)}
        loader.close()
    finally:
        loader_mod.build_microbatch = orig

    # both proposal buckets appear, each batch uniform in N
    assert shapes == {32, 64}


def test_load_iou_maps_permuted_index_gathers():
    """A full-length but UNSORTED index must gather, not hit the identity
    fast path (which used to check only the two endpoints)."""
    from cim_tpu.data.loader import load_iou_maps

    n = 4
    iou = np.arange(n * n, dtype=np.float16).reshape(n, n)
    entry = {"iou_map": iou, "asy_iou_map": iou * 2}
    idx = np.array([0, 2, 1, 3])
    got_iou, got_asy = load_iou_maps(None, entry, idx)
    np.testing.assert_array_equal(got_iou, iou[np.ix_(idx, idx)])
    np.testing.assert_array_equal(got_asy, (iou * 2)[np.ix_(idx, idx)])
    # the sorted identity index still short-circuits to the same values
    ident, _ = load_iou_maps(None, entry, np.arange(n))
    np.testing.assert_array_equal(ident, iou)
