"""End-to-end subprocess drives of the preprocessing/visualization CLIs
that other tests only exercise at the function level: generate_7_7,
create_cob_iou, point_level_label_assign, visualize_results. Each runs
as a REAL process over a shared on-disk fixture tree (.mat COB
proposals, COCO json, Center_points txts) and its outputs are verified
against the in-process library functions."""
from __future__ import annotations

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
from scipy.io import savemat

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

cv2 = pytest.importorskip("cv2")

IMG_IDS = [20070011, 20070012]
H, W = 40, 52


def _blob_masks(rng, n):
    out = []
    for _ in range(n):
        m = np.zeros((H, W), np.uint8)
        cy, cx, r = rng.randint(6, H - 6), rng.randint(6, W - 6), rng.randint(3, 7)
        yy, xx = np.mgrid[0:H, 0:W]
        m |= ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)
        out.append(m)
    return out


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("clie2e")
    cob = root / "cob"
    pts = root / "Center_points"
    imgs = root / "imgs"
    for d in (cob, pts, imgs):
        d.mkdir()
    rng = np.random.RandomState(3)
    images, annotations = [], []
    masks_by_id = {}
    aid = 1
    for img_id in IMG_IDS:
        s = str(img_id)
        name = s[:4] + "_" + s[4:]
        masks = _blob_masks(rng, 5)
        masks_by_id[img_id] = masks
        obj = np.empty((len(masks), 1), dtype=object)
        for i, m in enumerate(masks):
            obj[i, 0] = m
        savemat(str(cob / f"{name}.mat"), {"maskmat": obj})
        # a point inside the first blob + one on bare pixels
        ys, xs = np.nonzero(masks[0])
        (pts / f"{name}.txt").write_text(
            f"{xs[0]} {ys[0]} 2 0.9\n0 0 5 0.8\n"
        )
        cv2.imwrite(str(imgs / f"{name}.jpg"),
                    rng.randint(0, 256, (H, W, 3)).astype(np.uint8))
        images.append({"id": img_id, "file_name": f"{name}.jpg",
                       "height": H, "width": W})
        annotations.append({"id": aid, "image_id": img_id, "category_id": 3,
                            "iscrowd": 0, "area": 9, "bbox": [1, 1, 3, 3],
                            "segmentation": [[1, 1, 4, 1, 4, 4, 1, 4]]})
        aid += 1
    ann = root / "ann.json"
    ann.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": c + 1, "name": f"c{c}"} for c in range(20)],
    }))
    return root, masks_by_id


def _run(cmd, timeout=400):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable] + cmd, capture_output=True, text=True,
                       timeout=timeout, env=env, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    return r


def test_generate_7_7_cli(tree):
    root, masks_by_id = tree
    out = root / "props.pkl"
    _run(["tools/pre/generate_7_7.py", "--ann_file", str(root / "ann.json"),
          "--cob_dir", str(root / "cob"), "--output", str(out),
          "--dataset", "voc", "--nprocs", "2"])
    with open(out, "rb") as f:
        d = pickle.load(f)
    assert sorted(d["indexes"]) == sorted(IMG_IDS)
    for i, img_id in enumerate(d["indexes"]):
        boxes = d["boxes"][i]
        assert boxes.dtype == np.uint16 and boxes.shape == (5, 4)
        ys, xs = np.nonzero(masks_by_id[img_id][0])
        np.testing.assert_array_equal(
            boxes[0], [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        )
        assert d["masks"][i].shape == (5, 7, 7)
        assert (d["scores"][i] == 0).all()


def test_create_cob_iou_cli(tree):
    root, masks_by_id = tree
    iou_dir = root / "iou"
    asy_dir = root / "asy"
    _run(["tools/pre/create_cob_iou.py", "--ann_file", str(root / "ann.json"),
          "--cob_dir", str(root / "cob"), "--iou_dir", str(iou_dir),
          "--asy_iou_dir", str(asy_dir), "--dataset", "voc"])
    for img_id in IMG_IDS:
        s = str(img_id)
        name = s[:4] + "_" + s[4:]
        with open(iou_dir / f"{name}.pkl", "rb") as f:
            iou = pickle.load(f)
        with open(asy_dir / f"{name}.pkl", "rb") as f:
            asy = pickle.load(f)
        assert iou.dtype == np.float16 and asy.dtype == np.float16
        masks = np.stack(masks_by_id[img_id]).astype(np.float32)
        flat = masks.reshape(5, -1)
        inter = flat @ flat.T
        area = flat.sum(-1)
        want_iou = inter / (area[:, None] + area[None, :] - inter)
        want_asy = inter / area[None, :]
        np.testing.assert_allclose(np.asarray(iou, np.float32), want_iou,
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(asy, np.float32), want_asy,
                                   atol=2e-3)


def test_point_level_label_assign_cli(tree):
    root, masks_by_id = tree
    out = root / "point_assign.pkl"
    _run(["tools/pre/point_level_label_assign.py",
          "--ann_file", str(root / "ann.json"),
          "--cob_dir", str(root / "cob"),
          "--points_dir", str(root / "Center_points"),
          "--output", str(out), "--dataset", "voc"])
    sys.path.insert(0, os.path.join(REPO, "tools", "pre"))
    try:
        from point_level_label_assign import assign_from_points
    finally:
        sys.path.remove(os.path.join(REPO, "tools", "pre"))
    with open(out, "rb") as f:
        d = pickle.load(f)
    assert sorted(d["indexes"]) == sorted(IMG_IDS)
    for i, img_id in enumerate(d["indexes"]):
        masks = np.stack(masks_by_id[img_id])
        ys, xs = np.nonzero(masks[0])
        want = assign_from_points(
            masks, [(float(xs[0]), float(ys[0]), 2, 0.9),
                    (0.0, 0.0, 5, 0.8)], 20,
        )
        np.testing.assert_array_equal(d["mat"][i], want)
        # the in-blob point must have assigned its cluster...
        assert (d["mat"][i][:, 3] != 0).any()
        # ...and the dead (0,0) point advanced the index: bg cluster == 3
        if (d["mat"][i][:, 0] != 0).any():
            assert d["mat"][i][:, 0].max() == 3


def test_visualize_results_cli(tree):
    root, _ = tree
    # COCO-format result json over the fixture images
    results = []
    for img_id in IMG_IDS:
        results.append({
            "image_id": img_id, "category_id": 3, "score": 0.9,
            "bbox": [4, 4, 18, 15],
            "segmentation": {"size": [H, W],
                             "counts": None},
        })
    # encode a simple rectangle mask for each
    from cim_tpu.evaluation import rle as rle_util

    m = np.zeros((H, W), np.uint8)
    m[4:19, 4:22] = 1
    enc = rle_util.encode(m)
    for r in results:
        r["segmentation"] = enc
    res_file = root / "result.json"
    res_file.write_text(json.dumps(results))
    save_dir = root / "vis"
    out = _run(["tools/visualize_results.py", "--result_file", str(res_file),
                "--image_dir", str(root / "imgs"),
                "--save_dir", str(save_dir), "--score_thr", "0.5"])
    rendered = list(save_dir.glob("*"))
    assert rendered, out.stdout
