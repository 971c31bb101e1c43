"""Dynamic-int8 eval head (cfg.TPU.EVAL_INT8, ops/quant.py).

Beyond-parity TPU optimization (no reference counterpart — the reference
evaluates in f32 CUDA): the MaskFuse conv + fc1 run as w8a8 with dynamic
per-channel weight / per-tensor-or-row activation scales. These tests pin
(a) kernel-level error bounds vs f32, (b) param-tree compatibility (the
SAME variables serve both module variants), and (c) end-to-end refine-
score deviation through a full tiny CIMModel.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cim_tpu.ops.quant import int8_conv_nhwc, int8_dense


def test_int8_dense_error_bound():
    rng = np.random.RandomState(0)
    x = rng.randn(64, 512).astype(np.float32)
    w = (rng.randn(512, 256) * 0.05).astype(np.float32)
    b = rng.randn(256).astype(np.float32)
    got = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    ref = x @ w + b
    denom = np.abs(ref).mean()
    assert np.abs(got - ref).mean() / denom < 0.02
    assert np.abs(got - ref).max() / denom < 0.2


def test_int8_dense_int32_accumulation():
    # adversarial: many same-sign contributions would overflow int8/int16
    x = np.full((4, 4096), 3.0, np.float32)
    w = np.full((4096, 8), 0.02, np.float32)
    got = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w)))
    ref = x @ w
    np.testing.assert_allclose(got, ref, rtol=0.02)


def test_int8_conv_error_bound():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 7, 7, 64).astype(np.float32)
    w = (rng.randn(3, 3, 64, 32) * 0.05).astype(np.float32)
    b = rng.randn(32).astype(np.float32)
    got = np.asarray(int8_conv_nhwc(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(b), padding=1))
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b
    )
    denom = np.abs(ref).mean()
    assert np.abs(got - ref).mean() / denom < 0.03
    assert np.abs(got - ref).max() / denom < 0.3


def test_mask_fuse_int8_same_param_tree_and_close_outputs():
    from cim_tpu.models.mask_fuse import MaskFuse

    kw = dict(dim_in=32, spatial_scale=0.25, hidden_dim=64, roi_size=7,
              max_adaptive_grid=2)
    m_f32 = MaskFuse(**kw)
    m_int8 = MaskFuse(**kw, int8_eval=True)
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(16, 16, 32).astype(np.float32))
    rois = jnp.asarray(rng.rand(8, 4).astype(np.float32) * 40)
    masks = jnp.asarray((rng.rand(8, 7, 7) > 0.5).astype(np.float32))
    v = m_f32.init(jax.random.PRNGKey(0), feats, rois, masks)
    # identical param trees: the int8 module applies the f32 variables
    out_f32 = m_f32.apply(v, feats, rois, masks)
    out_int8 = m_int8.apply(v, feats, rois, masks)
    ref = np.asarray(out_f32)
    got = np.asarray(out_int8)
    denom = np.abs(ref).mean() + 1e-9
    assert np.abs(got - ref).mean() / denom < 0.05


def test_full_model_int8_refine_scores_close():
    import cim_tpu.models.tiny  # noqa: F401  (registers tiny.conv_body)
    from cim_tpu.config import clone_cfg, get_default_cfg
    from cim_tpu.models.builder import build_model

    cfg = clone_cfg(get_default_cfg())
    cfg.MODEL.CONV_BODY = "tiny.conv_body"
    cfg.MODEL.NUM_CLASSES = 20
    cfg.TPU.PROPOSAL_PAD = 16
    cfg.TPU.PRECISION = "f32"
    cfg.TPU.PALLAS_ROI_ALIGN = False
    cfg.TPU.REMAT_BOX_HEAD = False
    rng = np.random.RandomState(3)
    image = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    rois = jnp.asarray(rng.rand(16, 4).astype(np.float32) * 20)
    masks = jnp.asarray((rng.rand(16, 7, 7) > 0.5).astype(np.float32))
    valid = jnp.ones(16, bool)

    m = build_model(cfg)
    m8 = build_model(cfg, eval_int8=True)
    v = m.init(jax.random.PRNGKey(0), image, rois, masks, valid)
    out = m.apply(v, image, rois, masks, valid)
    out8 = m8.apply(v, image, rois, masks, valid)
    # refine_cls/refine_iou are post-softmax/sigmoid probabilities: the
    # int8 head must not move them materially
    for key in ("refine_cls", "refine_iou"):
        a, b = np.asarray(out[key]), np.asarray(out8[key])
        assert np.abs(a - b).max() < 0.05, key
        assert np.abs(a - b).mean() < 0.005, key


def test_trainer_never_uses_int8():
    """cfg.TPU.EVAL_INT8 must not leak into the training model: round()
    has zero gradient and would silently freeze the head."""
    import cim_tpu.models.tiny  # noqa: F401
    from cim_tpu.config import clone_cfg, get_default_cfg
    from cim_tpu.data.synthetic import make_microbatch
    from cim_tpu.engine.train import Trainer

    cfg = clone_cfg(get_default_cfg())
    cfg.MODEL.CONV_BODY = "tiny.conv_body"
    cfg.TPU.PROPOSAL_PAD = 16
    cfg.TPU.GRAD_ACCUM = 1
    cfg.TPU.DATA_PARALLEL = 1
    cfg.TPU.EVAL_INT8 = True  # eval knob ON; trainer must ignore it
    rng = np.random.RandomState(0)
    sample = make_microbatch(rng, image_hw=(32, 32), n_props=16, n_valid=12)
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)
    assert trainer.model.int8_eval is False


@pytest.mark.parametrize("check", ["grad_is_zero"])
def test_round_gradient_is_zero_documented(check):
    """The reason int8 is eval-only: d round(x)/dx == 0 everywhere."""
    g = jax.grad(lambda x: jnp.sum(jnp.round(x)))(jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_int8_conv_padding_invariance():
    """Per-SAMPLE activation scales (ops/quant.py): a valid ROI row's
    output must be bitwise independent of whatever rides in the pad rows
    — the padded==unpadded contract the engine relies on (an earlier
    per-tensor scale violated this: the bucket size changed valid rows'
    quantization)."""
    rng = np.random.RandomState(4)
    x = rng.randn(4, 7, 7, 16).astype(np.float32)
    w = (rng.randn(3, 3, 16, 8) * 0.1).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    out_small = np.asarray(int8_conv_nhwc(jnp.asarray(x), jnp.asarray(w),
                                          jnp.asarray(b), padding=1))
    pad = np.concatenate(
        [x, rng.randn(12, 7, 7, 16).astype(np.float32) * 1e3], axis=0
    )
    out_padded = np.asarray(int8_conv_nhwc(jnp.asarray(pad), jnp.asarray(w),
                                           jnp.asarray(b), padding=1))
    np.testing.assert_array_equal(out_small, out_padded[:4])


def test_int8_dense_padding_invariance():
    """Per-row activation scales: same contract for the matmul."""
    rng = np.random.RandomState(5)
    x = rng.randn(4, 64).astype(np.float32)
    w = (rng.randn(64, 8) * 0.1).astype(np.float32)
    out_small = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w)))
    pad = np.concatenate([x, rng.randn(12, 64).astype(np.float32) * 1e3], 0)
    out_padded = np.asarray(int8_dense(jnp.asarray(pad), jnp.asarray(w)))
    np.testing.assert_array_equal(out_small, out_padded[:4])


def test_evaluator_wires_int8_clone():
    """cfg.TPU.EVAL_INT8 takes effect exactly at the Evaluator: the
    module is cloned with int8_eval=True (preserving every caller
    attribute), the caller's f32 variables apply unchanged, and the
    scored output stays close to the f32 evaluator's."""
    import os

    from cim_tpu.config import clone_cfg, load_cfg
    from cim_tpu.engine.test import Evaluator
    from cim_tpu.models.builder import build_model
    import cim_tpu.models.tiny  # noqa: F401

    cfg = clone_cfg(load_cfg(os.path.join(
        os.path.dirname(__file__), "..", "configs", "resnet50_voc.yaml")))
    cfg.MODEL.CONV_BODY = "tiny.conv_body"
    cfg.TPU.PRECISION = "f32"
    cfg.TEST.SCALE = 64
    cfg.TEST.BBOX_AUG.ENABLED = False

    rng = np.random.RandomState(6)
    im = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
    n = 12
    x1 = rng.uniform(0, 30, n)
    y1 = rng.uniform(0, 25, n)
    boxes = np.stack([x1, y1, x1 + 20, y1 + 16], -1).astype(np.float32)
    masks = (rng.rand(n, 7, 7) > 0.5).astype(np.float32)

    model = build_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((64, 80, 3), np.float32),
        boxes, masks, np.ones(n, bool),
    )
    ev_f32 = Evaluator(cfg, model, variables)
    assert ev_f32.model.int8_eval is False

    cfg8 = clone_cfg(cfg)
    cfg8.TPU.EVAL_INT8 = True
    ev_int8 = Evaluator(cfg8, model, variables)
    assert ev_int8.model.int8_eval is True
    # caller attributes survive the clone
    assert ev_int8.model.conv_body == model.conv_body
    assert ev_int8.model.compute_dtype == model.compute_dtype

    s_f32, _ = ev_f32.im_detect_bbox(im, boxes, masks, 64, cfg.TEST.MAX_SIZE)
    s_int8, _ = ev_int8.im_detect_bbox(im, boxes, masks, 64, cfg.TEST.MAX_SIZE)
    assert np.abs(np.asarray(s_f32) - np.asarray(s_int8)).max() < 0.05
