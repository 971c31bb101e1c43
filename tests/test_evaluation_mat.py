"""The full-resolution COB `.mat` reload branch of tools/evaluation.py —
the path the reference's headline instance-seg numbers flow through
(reference tools/evaluation.py:89-116).

Covers: VOC and COCO `.mat` filename schemes, full-res-mask selection by
kept proposal index (the RLE in the result JSON must be the chosen COB
mask, not the 7x7 fallback), the box-area size filter
(proposal_size_limit=(2e-5, 0.85), reference :107-116,198), and the CLI
end to end with --cob_dir.
"""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
from scipy.io import savemat

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from cim_tpu.evaluation import rle as rle_util  # noqa: E402
from evaluation import eval_shard, load_cob_masks  # noqa: E402


def _save_voc_mat(path, masks):
    """VOC-style cell array: maskmat[:, 0][i] is an HxW uint8 mask."""
    cell = np.empty((len(masks), 1), object)
    for i, m in enumerate(masks):
        cell[i, 0] = m.astype(np.uint8)
    savemat(path, {"maskmat": cell})


def _masks(rng, n, h, w):
    out = []
    for _ in range(n):
        m = np.zeros((h, w), np.uint8)
        y, x = rng.randint(0, h - 8), rng.randint(0, w - 8)
        m[y : y + rng.randint(4, 8), x : x + rng.randint(4, 8)] = 1
        out.append(m)
    return out


def test_load_cob_masks_voc_scheme(tmp_path, rng):
    masks = _masks(rng, 5, 24, 32)
    _save_voc_mat(tmp_path / "2007_000032.mat", masks)
    entry = {"id": 2007000032, "image": "ignored/2007_000032.jpg"}
    got = load_cob_masks(str(tmp_path), entry, coco_scheme=False)
    assert len(got) == 5
    for g, m in zip(got, masks):
        np.testing.assert_array_equal(g, m)


@pytest.mark.parametrize(
    "fname", ["COCO_train2014_000000397133.mat",
              "COCO_val2014_000000397133.mat", "000000397133.mat"]
)
def test_load_cob_masks_coco_scheme(tmp_path, rng, fname):
    """COCO scheme tries COCO_train2014_/COCO_val2014_ prefixes then the
    bare basename (reference :90-99)."""
    masks = _masks(rng, 4, 20, 20)
    _save_voc_mat(tmp_path / fname, masks)
    entry = {"id": 397133, "image": "coco/val2017/000000397133.jpg"}
    got = load_cob_masks(str(tmp_path), entry, coco_scheme=True)
    assert len(got) == 4
    for g, m in zip(got, masks):
        np.testing.assert_array_equal(g, m)


def _opts(num_classes=20, proposal_filter=True):
    return {
        "num_classes": num_classes,
        "score_thresh": 1e-5,
        "nms": 0.3,
        "proposal_filter": proposal_filter,
        "coco_scheme": False,
    }


def _entry_and_dets(rng, tmp_path, n=6, h=40, w=50):
    """One VOC-like image: n proposals with full-res .mat masks; proposal 0
    scores highest for class 1."""
    masks = _masks(rng, n, h, w)
    boxes = []
    for m in masks:
        ys, xs = np.nonzero(m)
        boxes.append([xs.min(), ys.min(), xs.max(), ys.max()])
    boxes = np.asarray(boxes, np.float32)
    scores = np.full((n, 20), 1e-7, np.float32)
    scores[0, 0] = 0.9
    scores[3, 4] = 0.8
    _save_voc_mat(tmp_path / "2009_000123.mat", masks)
    entry = {
        "id": 2009000123,
        "image": str(tmp_path / "imgs" / "2009_000123.jpg"),
        "height": h,
        "width": w,
        "boxes": boxes,
        "masks": np.stack([m[:7, :7] for m in masks]),  # unused in mat branch
    }
    detections = {entry["image"]: {"scores": scores, "boxes": boxes}}
    return entry, detections, masks, scores


def test_eval_shard_mat_branch_selects_full_res_mask(tmp_path, rng):
    """The emitted RLE must decode to the original full-res COB mask of the
    kept proposal index (reference :121-130)."""
    entry, dets, masks, _ = _entry_and_dets(rng, tmp_path)
    cat_ids = list(range(1, 21))
    results = eval_shard((_opts(), [entry], dets, str(tmp_path), cat_ids))
    assert {r["category_id"] for r in results} == {1, 5}
    for r in results:
        dec = rle_util.decode(r["segmentation"])
        src = 0 if r["category_id"] == 1 else 3
        np.testing.assert_array_equal(dec, masks[src])
        assert r["image_id"] == 2009000123


def test_eval_shard_size_filter_drops_big_and_tiny_boxes(tmp_path, rng):
    """Box-area filter: proposals with box area > 0.85 or < 2e-5 of the
    image are zeroed regardless of score (reference :107-116)."""
    entry, dets, masks, scores = _entry_and_dets(rng, tmp_path)
    h, w = entry["height"], entry["width"]
    # make proposal 0's box cover ~the whole image (area fraction > 0.85)
    dets[entry["image"]]["boxes"][0] = [0, 0, w - 1, h - 1]
    entry["boxes"][0] = [0, 0, w - 1, h - 1]
    # give proposal 2 a degenerate box (area < 2e-5 of image) + top score
    dets[entry["image"]]["boxes"][2] = [5, 5, 5.05, 5.05]
    scores[2, 9] = 0.99
    cat_ids = list(range(1, 21))

    filtered = eval_shard((_opts(), [entry], dets, str(tmp_path), cat_ids))
    cats = {r["category_id"] for r in filtered}
    assert 1 not in cats  # big proposal 0 dropped
    assert 10 not in cats  # tiny proposal 2 dropped
    assert 5 in cats  # normal proposal 3 kept

    unfiltered = eval_shard(
        (_opts(proposal_filter=False), [entry], dets, str(tmp_path), cat_ids)
    )
    assert {1, 5, 10} <= {r["category_id"] for r in unfiltered}


@pytest.mark.slow
def test_evaluation_cli_with_cob_dir(tmp_path, rng):
    """tools/evaluation.py end to end with --cob_dir: fabricated
    detections.pkl + .mat fixtures -> segm JSON whose RLEs are the
    full-res masks -> finite mAP metrics."""
    import cv2

    from cim_tpu.data.synthetic import masks_to_7x7

    n_images, n_props, ncls = 3, 8, 20
    img_dir = tmp_path / "imgs"
    cob_dir = tmp_path / "cob"
    img_dir.mkdir()
    cob_dir.mkdir()

    images, annotations = [], []
    prop = {"indexes": [], "boxes": [], "masks": [], "scores": []}
    detections = {}
    aid = 1
    for i in range(n_images):
        h, w = 48, 64
        iid = 2010000001 + i
        s = str(iid)
        name = s[:4] + "_" + s[4:]
        cv2.imwrite(
            str(img_dir / f"{name}.jpg"),
            (rng.rand(h, w, 3) * 255).astype(np.uint8),
        )
        images.append(
            {"id": iid, "width": w, "height": h, "file_name": f"{name}.jpg"}
        )
        masks = _masks(rng, n_props, h, w)
        boxes = []
        for m in masks:
            ys, xs = np.nonzero(m)
            boxes.append([xs.min(), ys.min(), xs.max(), ys.max()])
        boxes = np.asarray(boxes, np.float32)
        _save_voc_mat(cob_dir / f"{name}.mat", masks)
        prop["indexes"].append(iid)
        prop["boxes"].append(boxes)
        prop["masks"].append(
            masks_to_7x7(np.stack(masks).astype(bool), boxes).astype(np.float32)
        )
        prop["scores"].append(rng.rand(n_props).astype(np.float32))
        scores = rng.rand(n_props, ncls).astype(np.float32) * 0.2
        scores[0, i % 3] = 0.9
        detections[str(img_dir / f"{name}.jpg")] = {
            "scores": scores, "boxes": boxes,
        }
        annotations.append(
            {
                "id": aid, "image_id": iid, "category_id": (i % 3) + 1,
                "bbox": [float(boxes[0][0]), float(boxes[0][1]),
                         float(boxes[0][2] - boxes[0][0] + 1),
                         float(boxes[0][3] - boxes[0][1] + 1)],
                "segmentation": rle_util.encode(masks[0]),
                "area": float(masks[0].sum()),
                "iscrowd": 0,
            }
        )
        aid += 1

    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(
        {"images": images, "annotations": annotations,
         "categories": [{"id": c + 1, "name": f"c{c}"} for c in range(ncls)]}
    ))
    with open(tmp_path / "props.pkl", "wb") as f:
        pickle.dump(prop, f)
    with open(tmp_path / "detections.pkl", "wb") as f:
        pickle.dump(detections, f)
    registry = tmp_path / "registry.json"
    registry.write_text(json.dumps({
        "synth_mat": {
            "image_directory": str(img_dir),
            "annotation_file": str(ann_file),
        }
    }))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["CIM_TPU_NO_CACHE"] = "1"
    env["CIM_TPU_DATASET_REGISTRY"] = str(registry)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "tools/evaluation.py",
         "--cfg", "configs/resnet50_voc.yaml",
         "--result_path", str(tmp_path / "detections.pkl"),
         "--dataset", "synth_mat_inline",
         "--cob_dir", str(cob_dir), "--nprocs", "2",
         "--output_dir", str(tmp_path / "out"),
         "--set", "TEST.DATASETS", "('synth_mat',)",
         "TEST.PROPOSAL_FILES", f"(r'{tmp_path / 'props.pkl'}',)",
         "DATA_DIR", str(tmp_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=560,
    )
    assert out.returncode == 0, out.stderr[-4000:]

    segm = json.loads((tmp_path / "out" / "segm_results.json").read_text())
    assert segm
    # every RLE decodes to one of that image's full-res COB masks
    by_image = {im["id"]: im["file_name"] for im in images}
    for r in segm:
        name = by_image[r["image_id"]].replace(".jpg", "")
        full = load_cob_masks(
            str(cob_dir), {"id": r["image_id"], "image": name}, False
        )
        dec = rle_util.decode(r["segmentation"])
        assert any(np.array_equal(dec, m) for m in full)

    metrics = json.loads((tmp_path / "out" / "inst_seg_metrics.json").read_text())
    for t in (25, 50, 70, 75):
        assert np.isfinite(metrics[f"mAP{t}"])
    # the top-scored proposal 0 matches gt exactly -> mAP must be positive
    assert metrics["mAP50"] > 0
