"""BatchedEvaluator == sequential Evaluator: cross-image batched TTA is a
pure scheduling change — per-image scores must match the one-image-at-a-
time path to fp32 round-off."""
import os

import numpy as np
import jax
import pytest

from cim_tpu.config import clone_cfg, load_cfg
from cim_tpu.engine.test import BatchedEvaluator, Evaluator
from cim_tpu.models.builder import build_model

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _cfg():
    import cim_tpu.models.tiny  # noqa: F401

    cfg = clone_cfg(load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml")))
    cfg.MODEL.CONV_BODY = "tiny.conv_body"
    cfg.TPU.PRECISION = "f32"
    cfg.TEST.SCALE = 96
    cfg.TEST.BBOX_AUG.ENABLED = True
    cfg.TEST.BBOX_AUG.SCALES = (128,)
    return cfg


def _items(rng, n_images=5):
    items = []
    for i in range(n_images):
        # two different native sizes -> two shape buckets in flight
        h, w = (96, 128) if i % 2 == 0 else (80, 96)
        im = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        n = 18 + i  # differing proposal counts
        x1 = rng.uniform(0, w * 0.4, n)
        y1 = rng.uniform(0, h * 0.4, n)
        boxes = np.stack(
            [x1, y1, x1 + rng.uniform(8, w * 0.5, n),
             y1 + rng.uniform(8, h * 0.5, n)], -1,
        ).astype(np.float32)
        masks = (rng.rand(n, 7, 7) > 0.5).astype(np.float32)
        items.append((im, boxes, masks))
    return items


@pytest.mark.parametrize("batch_size", [2, 4])
def test_batched_matches_sequential(rng, batch_size):
    cfg = _cfg()
    model = build_model(cfg)
    im0, b0, m0 = _items(rng, 1)[0]
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((96, 128, 3), np.float32),
        b0, m0, np.ones(len(b0), bool),
    )

    items = _items(rng)
    seq = Evaluator(cfg, model, variables)
    want = [seq.im_detect_all(im, b, m) for im, b, m in items]

    bat = BatchedEvaluator(cfg, model, variables, batch_size)
    got = bat.im_detect_all_many(items)

    for (gs, gb), (ws, wb) in zip(got, want):
        np.testing.assert_array_equal(gb, wb)
        np.testing.assert_allclose(gs, ws, rtol=1e-5, atol=1e-7)


def test_batched_falls_back_on_unsupported_heur(rng):
    cfg = _cfg()
    cfg.TEST.BBOX_AUG.SCORE_HEUR = "UNION"
    cfg.TEST.BBOX_AUG.COORD_HEUR = "UNION"
    model = build_model(cfg)
    items = _items(rng, 2)
    im0, b0, m0 = items[0]
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((96, 128, 3), np.float32),
        b0, m0, np.ones(len(b0), bool),
    )
    bat = BatchedEvaluator(cfg, model, variables, 2)
    seq = Evaluator(cfg, model, variables)
    got = bat.im_detect_all_many(items)
    want = [seq.im_detect_all(im, b, m) for im, b, m in items]
    for (gs, gb), (ws, wb) in zip(got, want):
        np.testing.assert_allclose(gs, ws, rtol=1e-6, atol=1e-8)
        np.testing.assert_array_equal(gb, wb)
