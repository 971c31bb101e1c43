"""End-to-end inference pipeline test: synthetic COCO-json dataset ->
JsonDataset/roidb -> TTA Evaluator (tiny backbone) -> detections.pkl ->
NMS post-processing -> COCO bbox eval. All on the CPU mesh."""
import json
import os
import pickle

import numpy as np
import jax
import pytest

from cim_tpu.config import clone_cfg, load_cfg
from cim_tpu.data import catalog
from cim_tpu.data.json_dataset import JsonDataset
from cim_tpu.data.synthetic import make_microbatch, masks_to_7x7, synthetic_masks

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.fixture
def synth_dataset(tmp_path, rng):
    """Write a 3-image COCO-style dataset + proposal pkl; register it."""
    n_images, n_props = 3, 24
    images, annotations = [], []
    prop = {"indexes": [], "boxes": [], "masks": [], "scores": []}
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    aid = 1
    for i in range(n_images):
        h, w = 96, 128
        images.append(
            {"id": i + 1, "width": w, "height": h, "file_name": f"{i:06d}.jpg"}
        )
        masks, boxes = synthetic_masks(rng, n_props, h, w)
        prop["indexes"].append(i + 1)
        prop["boxes"].append(boxes)
        prop["masks"].append(masks_to_7x7(masks, boxes).astype(np.float32))
        prop["scores"].append(rng.rand(n_props).astype(np.float32))
        # 2 gt objects per image reusing proposal boxes
        for j in range(2):
            b = boxes[j]
            annotations.append(
                {
                    "id": aid,
                    "image_id": i + 1,
                    "category_id": (j % 20) + 1,
                    "bbox": [
                        float(b[0]),
                        float(b[1]),
                        float(b[2] - b[0] + 1),
                        float(b[3] - b[1] + 1),
                    ],
                    "area": float((b[2] - b[0] + 1) * (b[3] - b[1] + 1)),
                    "iscrowd": 0,
                }
            )
            aid += 1
    categories = [{"id": c + 1, "name": f"class{c}"} for c in range(20)]
    ann_file = tmp_path / "ann.json"
    with open(ann_file, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations, "categories": categories},
            f,
        )
    prop_file = tmp_path / "props.pkl"
    with open(prop_file, "wb") as f:
        pickle.dump(prop, f)

    catalog.register_dataset(
        "synth_test",
        {catalog.IM_DIR: str(img_dir), catalog.ANN_FN: str(ann_file)},
    )
    return {"prop_file": str(prop_file), "tmp": tmp_path}


def _cfg(tmp_path):
    import cim_tpu.models.tiny  # noqa: F401

    cfg = clone_cfg(load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml")))
    cfg.MODEL.CONV_BODY = "tiny.conv_body"
    cfg.TEST.DATASETS = ("synth_test",)
    cfg.TEST.BBOX_AUG.ENABLED = True
    cfg.TEST.BBOX_AUG.SCALES = (128,)
    cfg.TEST.SCALE = 96
    cfg.DATA_DIR = str(tmp_path)
    cfg.TPU.MAX_CLUSTERS = 8
    return cfg


def test_run_inference_end_to_end(synth_dataset, rng):
    cfg = _cfg(synth_dataset["tmp"])
    cfg.TEST.PROPOSAL_FILES = (synth_dataset["prop_file"],)

    from cim_tpu.engine.test_engine import run_inference
    from cim_tpu.engine.train import Trainer

    sample = make_microbatch(rng, image_hw=(64, 64), n_props=32, n_valid=24)
    saved = cfg.TPU.PROPOSAL_PAD
    cfg.TPU.PROPOSAL_PAD = 32
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)
    cfg.TPU.PROPOSAL_PAD = saved
    variables = {"params": trainer.state.params, "stats": trainer.stats}

    def image_loader(entry):
        r = np.random.RandomState(entry["id"])
        return (r.rand(entry["height"], entry["width"], 3) * 255).astype(
            np.uint8
        )

    out_dir = str(synth_dataset["tmp"] / "out")
    results, all_boxes, all_scores = run_inference(
        cfg,
        trainer.model,
        variables,
        out_dir,
        image_loader=image_loader,
    )
    # detections.pkl written with per-image scores at proposal granularity
    det_file = os.path.join(out_dir, "detections.pkl")
    assert os.path.exists(det_file)
    with open(det_file, "rb") as f:
        dets = pickle.load(f)
    assert len(dets) == 3
    first = next(iter(dets.values()))
    assert first["scores"].shape == (24, 20)
    # TTA: scores averaged over 4 passes (hflip, 128, 128-hflip, identity)
    assert np.isfinite(first["scores"]).all()
    # COCO eval ran and produced finite AP stats
    assert "AP" in results and np.isfinite(results["AP"])
    # all_boxes structure: 21 class slots over 3 images
    assert len(all_boxes) == 21
    assert len(all_boxes[1]) == 3


def test_corloc_post_processing(synth_dataset, rng):
    cfg = _cfg(synth_dataset["tmp"])
    from cim_tpu.engine.test import box_results_for_corloc

    scores = rng.rand(24, 20).astype(np.float32)
    boxes = rng.rand(24, 4).astype(np.float32) * 50
    s, b, cls = box_results_for_corloc(cfg, scores, boxes)
    # one argmax box per class
    for j in range(1, 20):
        assert cls[j].shape == (1, 5)
        np.testing.assert_allclose(
            cls[j][0, 4], scores[:, j - 1].max(), rtol=1e-6
        )


def test_expected_results_gate_end_to_end(synth_dataset, rng, monkeypatch):
    """The regression gate wired through run_inference: a matching
    expectation passes, a seeded mismatch raises AND triggers the email
    path (reference task_evaluation.py:103-156 + logging.py:86-92 —
    latent upstream, live here)."""
    cfg = _cfg(synth_dataset["tmp"])
    cfg.TEST.PROPOSAL_FILES = (synth_dataset["prop_file"],)
    cfg.TEST.BBOX_AUG.ENABLED = False  # single pass: this test is about the gate

    from cim_tpu.engine.test_engine import run_inference
    from cim_tpu.engine.train import Trainer

    sample = make_microbatch(rng, image_hw=(64, 64), n_props=32, n_valid=24)
    cfg.TPU.PROPOSAL_PAD = 32
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)
    variables = {"params": trainer.state.params, "stats": trainer.stats}

    def image_loader(entry):
        r = np.random.RandomState(entry["id"])
        return (r.rand(entry["height"], entry["width"], 3) * 255).astype(np.uint8)

    # 1. matching expectation -> passes (huge atol absorbs the actual AP)
    cfg.EXPECTED_RESULTS = [["synth_test", "box", "AP", 0.0]]
    cfg.EXPECTED_RESULTS_ATOL = 10.0
    out_dir = str(synth_dataset["tmp"] / "gate_ok")
    run_inference(cfg, trainer.model, variables, out_dir,
                  check_expected_results=True, image_loader=image_loader)

    # 2. impossible expectation -> AssertionError + failure email sent
    sent = {}

    class FakeSMTP:
        def __init__(self, host):
            sent["host"] = host

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def sendmail(self, frm, to, msg):
            sent["to"] = to
            sent["msg"] = msg

    import smtplib

    monkeypatch.setattr(smtplib, "SMTP", FakeSMTP)
    cfg.EXPECTED_RESULTS = [["synth_test", "box", "AP", 99.0]]
    cfg.EXPECTED_RESULTS_ATOL = 0.001
    cfg.EXPECTED_RESULTS_RTOL = 0.0
    cfg.EXPECTED_RESULTS_EMAIL = "oncall@example.com"
    out_dir = str(synth_dataset["tmp"] / "gate_fail")
    with pytest.raises(AssertionError) as exc:
        run_inference(cfg, trainer.model, variables, out_dir,
                      check_expected_results=True, image_loader=image_loader)
    assert "AP" in str(exc.value)
    assert sent["to"] == ["oncall@example.com"]
    assert "AP" in sent["msg"]
