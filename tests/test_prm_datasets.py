"""PRM classification data pipeline + in-framework training step.

Reference contracts: lib/prm/prm_configs.py (transforms, VOC_Classification,
finetune), lib/prm/coco_dataset.py (COCO multi-hot), lib/prm/voc_dataset.py
(VOCWeak). torchvision/pycocotools are absent from this rig, so the
reference modules cannot be executed; the oracles here are torch
(MultiLabelSoftMarginLoss, normalize arithmetic) and hand-built fixtures.
"""
import json
import os

import numpy as np
import pytest

from cim_tpu.prm.datasets import (
    CATEGORIES_DICT,
    COCOClassification,
    VOCClassification,
    VOCWeak,
    decode_int_filename,
    finetune_label_fn,
    iterate_batches,
    parse_voc_objects,
    prm_transform,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_jpg(path, rng, hw=(37, 53)):
    arr = (rng.rand(*hw, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path, quality=95)
    return arr


def _voc_xml(stem, sizes, names_boxes):
    objs = "".join(
        f"<object><name>{n}</name><bndbox><xmin>{b[0]}</xmin>"
        f"<ymin>{b[1]}</ymin><xmax>{b[2]}</xmax><ymax>{b[3]}</ymax>"
        f"</bndbox></object>"
        for n, b in names_boxes
    )
    return (f"<annotation><filename>{stem}.jpg</filename>"
            f"<size><width>{sizes[1]}</width><height>{sizes[0]}</height>"
            f"</size>{objs}</annotation>")


# ------------------------------ transform ------------------------------- #

def test_prm_transform_matches_torch_normalize():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    img = (rng.rand(448, 448, 3) * 255).astype(np.uint8)  # no resize leg
    out = prm_transform(img)
    # torch oracle: ToTensor + Normalize (prm_configs.py:13-24)
    t = torch.from_numpy(img).permute(2, 0, 1).float() / 255.0
    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)
    ref = ((t - mean) / std).permute(1, 2, 0).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)
    assert out.shape == (448, 448, 3) and out.dtype == np.float32


def test_prm_transform_resizes_and_flips():
    rng = np.random.RandomState(1)
    img = (rng.rand(30, 60, 3) * 255).astype(np.uint8)
    out = prm_transform(img, size=64)
    assert out.shape == (64, 64, 3)
    np.testing.assert_allclose(
        prm_transform(img, hflip=True, size=64), out[:, ::-1], atol=1e-6
    )


# ------------------------------- datasets ------------------------------- #

def _make_voc_dir(tmp_path, n=3):
    rng = np.random.RandomState(7)
    d = tmp_path / "VOC2012"
    (d / "JPEGImages").mkdir(parents=True)
    (d / "Annotations").mkdir()
    (d / "ImageSets" / "Main").mkdir(parents=True)
    ids, labels = [], {}
    for i in range(n):
        iid = 2007000032 + i
        stem = decode_int_filename(iid)
        _write_jpg(str(d / "JPEGImages" / f"{stem}.jpg"), rng)
        lab = np.zeros(20, np.float32)
        lab[[i % 20, (i + 5) % 20]] = 1.0
        labels[iid] = lab
        ids.append(iid)
        names_boxes = [(list(CATEGORIES_DICT)[i % 20], (3, 4, 20, 30)),
                       (list(CATEGORIES_DICT)[(i + 5) % 20], (8, 2, 40, 25))]
        (d / "Annotations" / f"{stem}.xml").write_text(
            _voc_xml(stem, (37, 53), names_boxes)
        )
    (d / "ImageSets" / "Main" / "train.txt").write_text(
        "\n".join(str(i) for i in ids)
    )
    # VOCWeak-style split: stem names (voc_dataset.py:130-134), not ints
    (d / "ImageSets" / "Main" / "weak.txt").write_text(
        "\n".join(decode_int_filename(i) for i in ids)
    )
    np.save(str(d / "cls_labels.npy"), np.array(labels, dtype=object))
    return d, ids, labels


def test_voc_classification(tmp_path):
    d, ids, labels = _make_voc_dir(tmp_path)
    ds = VOCClassification(str(d), split="train")
    assert len(ds) == 3
    img, tgt = ds.__getitem__(1)
    assert img.shape == (448, 448, 3)
    np.testing.assert_array_equal(tgt, labels[ids[1]])
    # train-mode hflip is rng-driven and deterministic under a fixed seed
    img_a, _ = ds.__getitem__(0, rng=np.random.RandomState(3))
    img_b, _ = ds.__getitem__(0, rng=np.random.RandomState(3))
    np.testing.assert_array_equal(img_a, img_b)


def test_voc_weak(tmp_path):
    d, ids, _ = _make_voc_dir(tmp_path)
    ds = VOCWeak(str(d), image_set="weak")
    img, img_labels, boxes, cls, stem = ds[0]
    assert img.shape == (448, 448, 3) and img_labels.shape == (21,)
    assert stem == decode_int_filename(ids[0])
    # background slot 0 never set; annotated classes at +1 offset
    assert img_labels[0] == 0
    np.testing.assert_array_equal(sorted(cls), sorted([0 % 20 + 1, 5 % 20 + 1]))
    assert img_labels[cls].all() and img_labels.sum() == len(set(cls.tolist()))
    np.testing.assert_array_equal(boxes[0], [3, 4, 20, 30])


def test_parse_voc_objects_empty(tmp_path):
    p = tmp_path / "e.xml"
    p.write_text(_voc_xml("e", (10, 10), []))
    boxes, cls, stem = parse_voc_objects(str(p))
    assert boxes.shape == (0, 4) and cls.shape == (0,) and stem == "e"


def test_coco_classification(tmp_path):
    rng = np.random.RandomState(2)
    imdir = tmp_path / "imgs"
    imdir.mkdir()
    _write_jpg(str(imdir / "a.jpg"), rng)
    _write_jpg(str(imdir / "b.jpg"), rng)
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 53, "height": 37},
                   {"id": 2, "file_name": "b.jpg", "width": 53, "height": 37}],
        # sparse category ids: 13 -> contiguous 11, 90 -> 79
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 13,
             "bbox": [1, 1, 5, 5], "area": 25, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 90,
             "bbox": [2, 2, 5, 5], "area": 25, "iscrowd": 0},
            {"id": 3, "image_id": 2, "category_id": 1,
             "bbox": [0, 0, 5, 5], "area": 25, "iscrowd": 0},
        ],
        "categories": [{"id": c, "name": str(c)} for c in (1, 13, 90)],
    }
    af = tmp_path / "ann.json"
    af.write_text(json.dumps(ann))
    ds = COCOClassification(str(imdir), str(af), train=False, size=64)
    img, tgt = ds[0]
    assert img.shape == (64, 64, 3) and tgt.shape == (80,)
    assert tgt[11] == 1 and tgt[79] == 1 and tgt.sum() == 2
    _, tgt2 = ds[1]
    assert tgt2[0] == 1 and tgt2.sum() == 1


def test_iterate_batches_fixed_shape(tmp_path):
    d, _, _ = _make_voc_dir(tmp_path)
    ds = VOCClassification(str(d), split="train", size=64)
    batches = list(iterate_batches(ds, 2, np.random.RandomState(0)))
    assert len(batches) == 1  # ragged tail dropped
    assert batches[0][0].shape == (2, 64, 64, 3)
    assert batches[0][1].shape == (2, 20)


# ------------------------- loss + finetune groups ------------------------ #

def test_multilabel_soft_margin_loss_vs_torch():
    torch = pytest.importorskip("torch")
    from cim_tpu.prm.train import multilabel_soft_margin_loss

    rng = np.random.RandomState(4)
    logits = rng.randn(5, 20).astype(np.float32) * 3
    targets = (rng.rand(5, 20) < 0.3).astype(np.float32)
    ours = float(multilabel_soft_margin_loss(logits, targets))
    ref = float(torch.nn.MultiLabelSoftMarginLoss()(
        torch.from_numpy(logits), torch.from_numpy(targets)
    ))
    assert abs(ours - ref) < 1e-6


def test_finetune_label_fn_groups():
    params = {
        "res2_block0": {"conv": {"kernel": np.zeros(1)}},
        "classifier": {"kernel": np.zeros(1), "bias": np.zeros(1)},
    }
    labels = finetune_label_fn(params, {"res": 0.01})
    assert labels["res2_block0"]["conv"]["kernel"] == "res"
    assert labels["classifier"]["kernel"] == "rest"


def test_prm_trainer_learns():
    """3 steps of the jitted train step on a tiny fixture: finite and
    decreasing loss; backbone group moves ~100x slower than classifier."""
    import jax

    from cim_tpu.prm.train import PRMClassifierTrainer

    trainer = PRMClassifierTrainer(num_classes=20, base_lr=0.05,
                                   groups={"res": 0.01}, weight_decay=0.0,
                                   image_hw=(64, 64))
    state = trainer.init(jax.random.PRNGKey(0))
    p0 = jax.tree_util.tree_map(np.array, state.params)
    rng = np.random.RandomState(0)
    images = rng.randn(2, 64, 64, 3).astype(np.float32)
    targets = (rng.rand(2, 20) < 0.3).astype(np.float32)
    losses = []
    for _ in range(3):
        state, loss = trainer.step(state, images, targets)
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    # group LRs: classifier kernel moved, backbone moved much less
    d_cls = float(np.abs(
        np.array(state.params["classifier"]["kernel"])
        - p0["classifier"]["kernel"]
    ).max())
    d_bb = float(np.abs(
        np.array(state.params["res1_conv"]["kernel"])
        - p0["res1_conv"]["kernel"]
    ).max())
    assert d_cls > 0 and d_bb > 0 and d_bb < d_cls
