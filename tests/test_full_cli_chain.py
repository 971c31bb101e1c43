"""The full CLI chain over an on-disk synthetic dataset:

  tools/train.py (real data path: images from disk, proposal pkl,
  per-image IoU pkl dirs, label-assign pkl, TrainLoader, checkpoints)
  -> tools/test_net.py (checkpoint restore, TTA, detections.pkl)
  -> tools/evaluation.py (mask NMS, RLE, instance-seg COCOeval)

This is the metric-level integration test the reference never had
(SURVEY.md §4); tiny backbone, CPU mesh."""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=560):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["CIM_TPU_NO_CACHE"] = "1"
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, capture_output=True,
        text=True, timeout=timeout,
    )


@pytest.fixture
def disk_dataset(tmp_path, rng):
    """Synthetic VOC-like dataset fully on disk."""
    import cv2

    from cim_tpu.data.synthetic import (
        mask_matrices,
        masks_to_7x7,
        synthetic_masks,
    )

    n_images, n_props, ncls = 6, 20, 20
    img_dir = tmp_path / "imgs"
    iou_dir = tmp_path / "iou"
    asy_dir = tmp_path / "asy"
    for d in (img_dir, iou_dir, asy_dir):
        d.mkdir()

    images, annotations = [], []
    prop = {"indexes": [], "boxes": [], "masks": [], "scores": []}
    mats = {"indexes": [], "mat": []}
    aid = 1
    for i in range(n_images):
        h, w = 96, 128
        name = f"{i:06d}"
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{name}.jpg"), img)
        images.append(
            {"id": i + 1, "width": w, "height": h, "file_name": f"{name}.jpg"}
        )
        masks, boxes = synthetic_masks(rng, n_props, h, w)
        iou, asy = mask_matrices(masks)
        with open(iou_dir / f"{name}.pkl", "wb") as f:
            pickle.dump(iou.astype(np.float16), f)
        with open(asy_dir / f"{name}.pkl", "wb") as f:
            pickle.dump(asy.astype(np.float16), f)
        prop["indexes"].append(i + 1)
        prop["boxes"].append(boxes)
        prop["masks"].append(masks_to_7x7(masks, boxes).astype(np.float32))
        prop["scores"].append(rng.rand(n_props).astype(np.float32))
        mat = np.zeros((n_props, ncls + 1), np.float32)
        cls0 = int(rng.randint(0, 3))
        mat[0, cls0 + 1] = 1
        mats["indexes"].append(i + 1)
        mats["mat"].append(mat)
        # 2 gt objects (segmentations = the first proposals' masks)
        from cim_tpu.evaluation import rle as rle_util

        for j in range(2):
            b = boxes[j]
            cat = (j % 3) + 1
            annotations.append(
                {
                    "id": aid, "image_id": i + 1, "category_id": cat,
                    "bbox": [float(b[0]), float(b[1]),
                             float(b[2] - b[0] + 1), float(b[3] - b[1] + 1)],
                    "segmentation": rle_util.encode(masks[j].astype(np.uint8)),
                    "area": float(masks[j].sum()),
                    "iscrowd": 0,
                }
            )
            aid += 1
    ann_file = tmp_path / "ann.json"
    with open(ann_file, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations,
             "categories": [{"id": c + 1, "name": f"c{c}"} for c in range(ncls)]},
            f,
        )
    with open(tmp_path / "props.pkl", "wb") as f:
        pickle.dump(prop, f)
    with open(tmp_path / "label_assign.pkl", "wb") as f:
        pickle.dump(mats, f)

    # dataset registry consumed by the CLIs via CIM_TPU_DATASET_REGISTRY
    registry = tmp_path / "registry.json"
    registry.write_text(json.dumps({
        "synth_disk": {
            "image_directory": str(img_dir),
            "annotation_file": str(ann_file),
        }
    }))
    return tmp_path


@pytest.mark.slow
def test_train_testnet_evaluation_chain(disk_dataset, tmp_path):
    root = disk_dataset
    out_dir = root / "out"

    def run(args, timeout=560, xla_flags=None):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO
        env["CIM_TPU_NO_CACHE"] = "1"
        env["CIM_TPU_DATASET_REGISTRY"] = str(root / "registry.json")
        env.pop("XLA_FLAGS", None)
        if xla_flags:
            env["XLA_FLAGS"] = xla_flags
        return subprocess.run(
            [sys.executable] + args, cwd=REPO, env=env, capture_output=True,
            text=True, timeout=timeout,
        )

    common_sets = [
        "--set",
        "MODEL.CONV_BODY", "tiny.conv_body",
        "TPU.PROPOSAL_PAD", "32",
        "TPU.MAX_CLUSTERS", "4",
        "TPU.DATA_PARALLEL", "1",
        "TRAIN.DATASETS", "('synth_disk',)",
        "TEST.DATASETS", "('synth_disk',)",
        "TRAIN.PROPOSAL_FILES", f"(r'{root / 'props.pkl'}',)",
        "TRAIN.REFINE_FILES", f"(r'{root / 'label_assign.pkl'}',)",
        "TEST.PROPOSAL_FILES", f"(r'{root / 'props.pkl'}',)",
        "TRAIN.SCALES", "(96,)",
        "TEST.SCALE", "96",
        "TEST.BBOX_AUG.ENABLED", "False",
        "iou_dir", str(root / "iou"),
        "asy_iou_dir", str(root / "asy"),
        "DATA_DIR", str(root),
    ]

    # 1. train 4 steps on the on-disk dataset
    out = run(
        ["tools/train.py", "--cfg", "configs/resnet50_voc.yaml",
         "--iter_size", "2", "--max_iter", "4",
         "--output_dir", str(out_dir), "--disp_interval", "1"]
        + common_sets
    )
    assert out.returncode == 0, out.stderr[-4000:]
    assert (out_dir / "ckpt").is_dir()

    # 2. inference + detection eval (COCO bbox) from the checkpoint —
    # through the mesh-sharded batched evaluator (TPU.EVAL_DEVICES): the
    # stacked batch axis partitions over 4 of 8 forced CPU devices,
    # driving the in-process multi-device eval path end to end
    out = run(
        ["tools/test_net.py", "--cfg", "configs/resnet50_voc.yaml",
         "--load_ckpt", str(out_dir / "ckpt"),
         "--output_dir", str(out_dir / "test")]
        + common_sets
        + ["TPU.EVAL_BATCH", "4", "TPU.EVAL_DEVICES", "4"],
        xla_flags="--xla_force_host_platform_device_count=8",
    )
    assert out.returncode == 0, out.stderr[-4000:]
    det_file = out_dir / "test" / "detections.pkl"
    assert det_file.exists()
    with open(det_file, "rb") as f:
        dets = pickle.load(f)
    assert len(dets) == 6
    for rec in dets.values():
        assert rec["scores"].shape == (20, 20)
        assert np.isfinite(rec["scores"]).all()

    # 2c. parent-mode subprocess fan-out (reference
    # multi_gpu_test_net_on_dataset + utils/subprocess.py): two child
    # --range shards, merged by the parent — detections must be
    # identical to the single-process pass
    out = run(
        ["tools/test_net.py", "--cfg", "configs/resnet50_voc.yaml",
         "--load_ckpt", str(out_dir / "ckpt"), "--multi_proc", "2",
         "--output_dir", str(out_dir / "test_mp")]
        + common_sets,
        timeout=840,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    with open(out_dir / "test_mp" / "detections.pkl", "rb") as f:
        dets_mp = pickle.load(f)
    assert sorted(dets_mp) == sorted(dets)
    for k in dets:
        np.testing.assert_allclose(
            dets_mp[k]["scores"], dets[k]["scores"], rtol=1e-6,
            err_msg="multi_proc detections diverged from single-process",
        )

    # 3. instance-segmentation evaluation (mask NMS + RLE + COCOeval)
    out = run(
        ["tools/evaluation.py", "--cfg", "configs/resnet50_voc.yaml",
         "--result_path", str(det_file), "--nprocs", "1",
         "--output_dir", str(out_dir / "test")]
        + common_sets
        + ["--dataset", "synth_disk_inline"]
    )
    # tools/evaluation.py maps named datasets; patch: it accepts any name
    # registered in the catalog via TEST.DATASETS already set above.
    assert out.returncode == 0, out.stderr[-4000:]
    metrics_file = out_dir / "test" / "inst_seg_metrics.json"
    assert metrics_file.exists()
    metrics = json.loads(metrics_file.read_text())
    for t in (25, 50, 70, 75):
        assert f"mAP{t}" in metrics
        assert np.isfinite(metrics[f"mAP{t}"])


@pytest.mark.slow
def test_testnet_cli_exits_nonzero_on_gate_mismatch(disk_dataset):
    """tools/test_net.py with a seeded EXPECTED_RESULTS mismatch must exit
    non-zero (the regression-gate CI contract)."""
    root = disk_dataset

    def run(args, timeout=560):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO
        env["CIM_TPU_NO_CACHE"] = "1"
        env["CIM_TPU_DATASET_REGISTRY"] = str(root / "registry.json")
        env.pop("XLA_FLAGS", None)
        return subprocess.run(
            [sys.executable] + args, cwd=REPO, env=env, capture_output=True,
            text=True, timeout=timeout,
        )

    sets = [
        "--set",
        "MODEL.CONV_BODY", "tiny.conv_body",
        "TPU.PROPOSAL_PAD", "32",
        "TPU.MAX_CLUSTERS", "4",
        "TPU.DATA_PARALLEL", "1",
        "TEST.DATASETS", "('synth_disk',)",
        "TEST.PROPOSAL_FILES", f"(r'{root / 'props.pkl'}',)",
        "TEST.SCALE", "96",
        "TEST.BBOX_AUG.ENABLED", "False",
        "DATA_DIR", str(root),
        "EXPECTED_RESULTS", "[['synth_disk','box','AP',99.0]]",
        "EXPECTED_RESULTS_ATOL", "0.001",
        "EXPECTED_RESULTS_RTOL", "0.0",
    ]
    out = run(
        ["tools/test_net.py", "--cfg", "configs/resnet50_voc.yaml",
         "--output_dir", str(root / "gate_out")] + sets
    )
    assert out.returncode != 0
    assert "FAIL" in (out.stderr + out.stdout)
