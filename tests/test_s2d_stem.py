"""Space-to-depth stem (cfg.TPU.SPACE_TO_DEPTH_STEM) parity tests.

The s2d stem (cim_tpu/models/resnet.py:S2DStemConv) must be an
arithmetic-identical re-layout of the plain 7x7/s2 stem conv: same
parameter tree (checkpoint/weight-loader compatible), same outputs on
even AND odd shapes, same gradients. Reference stem contract:
torchvision conv1 as used by lib/modeling/resnet50.py:17-34.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cim_tpu.config import load_cfg, clone_cfg
from cim_tpu.models import ResNet50C4, build_model
from cim_tpu.models.resnet import S2DStemConv
from cim_tpu.models.layers import TorchConv

import os

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _stems(c=3):
    plain = TorchConv(
        64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
        name="res1_conv",
    )
    s2d = S2DStemConv(64, name="res1_conv")
    return plain, s2d


@pytest.mark.parametrize("hw", [(64, 96), (63, 95), (64, 95)])
def test_stem_conv_parity(rng, hw):
    """Same params, same output, even and odd input extents."""
    plain, s2d = _stems()
    x = jnp.asarray(rng.randn(2, hw[0], hw[1], 3).astype(np.float32))
    v_plain = plain.init(jax.random.PRNGKey(7), x)
    v_s2d = s2d.init(jax.random.PRNGKey(7), x)
    # identical param tree: same path, same shape, same init values
    assert jax.tree_util.tree_structure(v_plain) == jax.tree_util.tree_structure(v_s2d)
    k_p = v_plain["params"]["conv"]["kernel"]
    k_s = v_s2d["params"]["conv"]["kernel"]
    assert k_p.shape == k_s.shape == (7, 7, 3, 64)
    np.testing.assert_array_equal(np.asarray(k_p), np.asarray(k_s))

    out_p = plain.apply(v_plain, x)
    out_s = s2d.apply(v_plain, x)  # same variables on purpose
    assert out_p.shape == out_s.shape
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_p), rtol=1e-5, atol=1e-5
    )


def test_stem_conv_grad_parity(rng):
    plain, s2d = _stems()
    x = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32))
    v = plain.init(jax.random.PRNGKey(0), x)

    def loss(params, mod):
        out = mod.apply({"params": params}, x)
        return jnp.sum(out * jnp.cos(out))  # nontrivial cotangent

    g_p = jax.grad(loss)(v["params"], plain)
    g_s = jax.grad(loss)(v["params"], s2d)
    np.testing.assert_allclose(
        np.asarray(g_s["conv"]["kernel"]),
        np.asarray(g_p["conv"]["kernel"]),
        rtol=1e-4, atol=1e-5,
    )


def test_backbone_parity_and_bf16_compile(rng):
    """Full ResNet50C4 forward identical with the s2d stem; bf16 traces."""
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    base = ResNet50C4()
    v = base.init(jax.random.PRNGKey(1), x)
    out_base = base.apply(v, x)
    out_s2d = ResNet50C4(s2d_stem=True).apply(v, x)
    np.testing.assert_allclose(
        np.asarray(out_s2d), np.asarray(out_base), rtol=1e-4, atol=1e-4
    )
    # padded-bucket masking invariant: valid_hw threading unchanged
    out_pad_b = base.apply(v, jnp.pad(x, ((0, 0), (0, 32), (0, 32), (0, 0))),
                           valid_hw=(64, 96))
    out_pad_s = ResNet50C4(s2d_stem=True).apply(
        v, jnp.pad(x, ((0, 0), (0, 32), (0, 32), (0, 0))), valid_hw=(64, 96)
    )
    np.testing.assert_allclose(
        np.asarray(out_pad_s), np.asarray(out_pad_b), rtol=1e-4, atol=1e-4
    )
    # bf16 compute path traces and matches loosely
    bf16 = ResNet50C4(s2d_stem=True, dtype=jnp.bfloat16).apply(v, x)
    assert bf16.shape == out_base.shape


def test_build_model_honors_cfg_knob(rng):
    cfg = clone_cfg(load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml")))
    cfg.TPU.SPACE_TO_DEPTH_STEM = True
    model = build_model(cfg)
    assert model.s2d_stem
    n, c = 8, cfg.MODEL.NUM_CLASSES
    img = jnp.asarray(rng.randn(48, 64, 3).astype(np.float32))
    rois = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, 30, n),
                rng.uniform(0, 20, n),
                rng.uniform(32, 63, n),
                rng.uniform(24, 47, n),
            ],
            axis=1,
        ).astype(np.float32)
    )
    masks = jnp.asarray((rng.rand(n, 7, 7) > 0.5).astype(np.float32))
    valid = jnp.ones((n,), bool)
    v = model.init(jax.random.PRNGKey(0), img, rois, masks, valid)
    out = model.apply(v, img, rois, masks, valid)

    base = build_model(clone_cfg(load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml"))))
    out_b = base.apply(v, img, rois, masks, valid)  # same variables
    np.testing.assert_allclose(
        np.asarray(out["predict_cls"]), np.asarray(out_b["predict_cls"]),
        rtol=2e-3, atol=2e-3,
    )
