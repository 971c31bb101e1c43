"""Pseudo-label exporter (tools/generate_mask_for_MaskRCNN.py): the
export shard must produce valid COCO annotations from discovery scores,
with --is_best keeping exactly the top-scoring instance per gt class."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cim_tpu.data.synthetic import synthetic_masks
from cim_tpu.evaluation import rle as rle_util
from tools.generate_mask_for_MaskRCNN import export_shard


def _case(rng, is_best):
    n_props = 15
    masks, boxes = synthetic_masks(rng, n_props, 50, 70)
    gt = np.zeros((1, 20), np.int32)
    gt[0, [2, 5]] = 1  # classes 2 and 5 present
    entry = {
        "id": 2008000001, "image": "2008_000001.jpg",
        "height": 50, "width": 70,
        "boxes": boxes.astype(np.float32),
        "masks": (rng.rand(n_props, 7, 7) > 0.5).astype(np.float32),
        "gt_classes": gt,
    }
    scores = rng.dirichlet(np.ones(20), size=n_props).astype(np.float32)
    detections = {entry["image"]: {"scores": scores, "boxes": boxes}}
    opts = {"num_classes": 20, "score_thresh": 1e-5, "nms": 0.3,
            "is_best": is_best}
    return export_shard((opts, [entry], detections, None))


def test_export_all_nms_survivors(rng):
    images, anns = _case(rng, is_best=False)
    assert len(images) == 1
    assert len(anns) >= 2  # at least one instance per present class
    cats = {a["category_id"] for a in anns}
    assert cats.issubset({3, 6})  # contiguous classes 2,5 -> VOC ids 3,6
    for a in anns:
        m = rle_util.decode(a["segmentation"])
        assert m.shape == (50, 70)
        assert a["area"] == int(m.sum()) > 0
        assert 0 <= a["score"] <= 1


def test_export_is_best_keeps_one_per_class(rng):
    _, anns = _case(rng, is_best=True)
    per_class = {}
    for a in anns:
        per_class.setdefault(a["category_id"], []).append(a)
    for cat, items in per_class.items():
        assert len(items) == 1, f"class {cat} kept {len(items)}"


def test_exporter_cli_end_to_end_with_mp_shards(tmp_path):
    """The full CLI (arg parsing, roidb build via the dataset registry,
    2-process mp.Pool sharding, shard merge with dense annotation-id
    renumbering, json write) over an on-disk fixture dataset — the main()
    path the unit tests above bypass. Round-robin sharding must yield the
    same annotation SET as a single process, with ids densely renumbered."""
    import json
    import pickle
    import subprocess

    rng = np.random.RandomState(7)
    root = tmp_path
    img_dir = root / "imgs"
    img_dir.mkdir()
    n_images, n_props, ncls = 5, 12, 20
    images, annotations = [], []
    prop = {"indexes": [], "boxes": [], "masks": [], "scores": []}
    detections = {}
    aid = 1
    for i in range(n_images):
        h, w = 48, 64
        name = f"2008_{i:06d}"
        path = img_dir / f"{name}.jpg"
        path.write_bytes(b"")  # never read by the exporter
        img_id = 2008000000 + i
        images.append({"id": img_id, "file_name": f"{name}.jpg",
                       "height": h, "width": w})
        masks, boxes = synthetic_masks(rng, n_props, h, w)
        for c in (2, 5):
            annotations.append({
                "id": aid, "image_id": img_id, "category_id": c + 1,
                "iscrowd": 0, "area": 25, "bbox": [1, 1, 5, 5],
                "segmentation": [[1, 1, 6, 1, 6, 6, 1, 6]],
            })
            aid += 1
        prop["indexes"].append(img_id)
        prop["boxes"].append(boxes.astype(np.uint16))
        prop["masks"].append((rng.rand(n_props, 7, 7) > 0.5))
        prop["scores"].append(np.zeros(n_props))
        scores = rng.dirichlet(np.ones(ncls), size=n_props).astype(np.float32)
        detections[str(path)] = {"scores": scores,
                                 "boxes": boxes.astype(np.float32)}

    ann_file = root / "ann.json"
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": c + 1, "name": f"c{c}"}
                                  for c in range(ncls)]}, f)
    with open(root / "props.pkl", "wb") as f:
        pickle.dump(prop, f)
    with open(root / "discovery.pkl", "wb") as f:
        pickle.dump(detections, f)
    registry = root / "registry.json"
    registry.write_text(json.dumps({
        "voc_2012_trainaug": {
            "image_directory": str(img_dir),
            "annotation_file": str(ann_file),
        }
    }))

    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.abspath(repo)
    env["CIM_TPU_DATASET_REGISTRY"] = str(registry)
    env.pop("XLA_FLAGS", None)

    def run_cli(out_dir, nprocs):
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "tools",
                                          "generate_mask_for_MaskRCNN.py"),
             "--cfg", os.path.join(repo, "configs", "resnet50_voc.yaml"),
             "--result_path", str(root / "discovery.pkl"),
             "--output_dir", str(out_dir), "--nprocs", str(nprocs),
             "--set", "TRAIN.PROPOSAL_FILES", f"(r'{root / 'props.pkl'}',)",
             # gt cache lives under DATA_DIR/cache keyed by dataset NAME:
             # point it at the fixture root so stale repo caches never leak in
             "DATA_DIR", str(root)],
            capture_output=True, text=True, timeout=560, env=env, cwd=repo,
        )
        assert r.returncode == 0, r.stderr[-4000:]
        with open(out_dir / "msrcnn_pseudo_label.json") as f:
            return json.load(f)

    single = run_cli(root / "out1", 1)
    sharded = run_cli(root / "out2", 2)

    assert len(single["images"]) == n_images
    assert len(single["annotations"]) > 0
    # dense id renumbering in merge order
    assert [a["id"] for a in sharded["annotations"]] == list(
        range(1, len(sharded["annotations"]) + 1)
    )

    def key(a):
        return (a["image_id"], a["category_id"], tuple(a["bbox"]),
                a["segmentation"]["counts"])

    assert sorted(map(key, single["annotations"])) == sorted(
        map(key, sharded["annotations"])
    ), "mp-sharded export diverged from single-process"
