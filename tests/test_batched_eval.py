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


def _cfg(fused=False):
    import cim_tpu.models.tiny  # noqa: F401

    cfg = clone_cfg(load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml")))
    cfg.MODEL.CONV_BODY = "tiny.conv_body"
    cfg.TPU.PRECISION = "f32"
    cfg.TPU.FUSED_TTA = fused
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


def test_fused_tta_matches_per_pass(rng):
    """Device-side fused TTA (one program, on-device resize/flip) vs the
    host per-pass path. Differences come only from cv2-vs-XLA bilinear
    round-off (< 0.01 of a pixel LSB pre-truncation), so scores agree
    tightly."""
    cfg = _cfg(fused=False)
    model = build_model(cfg)
    items = _items(rng, 3)
    im0, b0, m0 = items[0]
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((96, 128, 3), np.float32),
        b0, m0, np.ones(len(b0), bool),
    )
    seq = Evaluator(cfg, model, variables)
    want = [seq.im_detect_all(im, b, m) for im, b, m in items]

    cfg_f = _cfg(fused=True)
    fz = Evaluator(cfg_f, model, variables)
    assert fz.fused_supported()
    got = [fz.im_detect_all(im, b, m) for im, b, m in items]

    for (gs, gb), (ws, wb) in zip(got, want):
        np.testing.assert_array_equal(gb, wb)
        assert gs.shape == ws.shape
        np.testing.assert_allclose(gs, ws, rtol=5e-3, atol=5e-4)
        # scores correlate essentially perfectly
        c = np.corrcoef(gs.ravel(), ws.ravel())[0, 1]
        assert c > 0.9999


def test_fused_batched_matches_fused_single(rng):
    cfg = _cfg(fused=True)
    model = build_model(cfg)
    items = _items(rng, 5)
    im0, b0, m0 = items[0]
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((96, 128, 3), np.float32),
        b0, m0, np.ones(len(b0), bool),
    )
    single = Evaluator(cfg, model, variables)
    want = [single.im_detect_all(im, b, m) for im, b, m in items]
    bat = BatchedEvaluator(cfg, model, variables, 2)
    got = bat.im_detect_all_many(items)
    for (gs, gb), (ws, wb) in zip(got, want):
        np.testing.assert_array_equal(gb, wb)
        np.testing.assert_allclose(gs, ws, rtol=1e-5, atol=1e-7)


def test_fused_falls_back_on_aspect_ratio_tta(rng):
    cfg = _cfg(fused=True)
    cfg.TEST.BBOX_AUG.ASPECT_RATIOS = (0.75,)
    model = build_model(cfg)
    items = _items(rng, 1)
    im0, b0, m0 = items[0]
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((96, 128, 3), np.float32),
        b0, m0, np.ones(len(b0), bool),
    )
    ev = Evaluator(cfg, model, variables)
    assert not ev.fused_supported()
    s, b = ev.im_detect_all(im0, b0, m0)  # per-pass path incl. AR passes
    assert np.isfinite(s).all()


def test_ratio_bucket_canvas_always_bounds_content():
    """The rectangular fused-TTA canvas (ceil(target*ratio_bucket) rounded
    up to 64 px, PAD_MULTIPLE // 2) must contain the resized content
    round(src*target/max_side) for every image shape and TTA target —
    pure canvas arithmetic, no model involved."""
    from cim_tpu.engine.test import PAD_MULTIPLE, _round_up

    rng = np.random.RandomState(0)
    targets = [480, 576, 688, 864, 1200]
    shapes = [(375, 500), (500, 375), (127, 128), (128, 127), (96, 128),
              (333, 500), (1, 500), (500, 1), (128, 128), (99, 481)]
    shapes += [tuple(rng.randint(1, 1200, 2)) for _ in range(200)]
    for h, w in shapes:
        rh, rw = Evaluator._ratio_bucket(h, w)
        assert (rh == 1.0) or (rw == 1.0)
        for t in targets:
            ch = _round_up(int(np.ceil(t * rh)), PAD_MULTIPLE // 2)
            cw = _round_up(int(np.ceil(t * rw)), PAD_MULTIPLE // 2)
            s = np.float32(t) / np.float32(max(h, w))
            ovh = int(round(float(np.float32(h) * s)))
            ovw = int(round(float(np.float32(w) * s)))
            assert ovh <= ch and ovw <= cw, ((h, w), t, (ovh, ovw), (ch, cw))


@pytest.mark.parametrize("fused", [False, True])
def test_mesh_sharded_batched_matches_single_device(rng, fused):
    """mesh=Mesh("dp"): the stacked batch axis partitions over devices —
    the in-process multi-device eval the reference gets from
    DataParallel-wrapping the test model (test_engine.py:354). Pure
    scheduling: per-image scores must match the unsharded evaluator."""
    from cim_tpu.parallel import data_parallel_mesh

    cfg = _cfg(fused=fused)
    model = build_model(cfg)
    items = _items(rng, 6)
    im0, b0, m0 = items[0]
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((96, 128, 3), np.float32),
        b0, m0, np.ones(len(b0), bool),
    )

    want = BatchedEvaluator(cfg, model, variables, 4).im_detect_all_many(items)

    mesh = data_parallel_mesh(4)
    ev = BatchedEvaluator(cfg, model, variables, 3, mesh=mesh)
    assert ev.batch_size == 4  # rounded up to the mesh size
    got = ev.im_detect_all_many(items)

    for (gs, gb), (ws, wb) in zip(got, want):
        np.testing.assert_array_equal(gb, wb)
        np.testing.assert_allclose(gs, ws, rtol=1e-5, atol=1e-6)
