"""Bucket zero-padding exactness.

Zero input is NOT a fixed point of BN / conv-with-bias, so naive
zero-padded buckets corrupt features near the image border (one row per
spatial conv of bleed) and shift border-proposal scores vs the
reference's unpadded execution (measured 3.4e-3 max rel err on resnet50
before the fix). Valid-extent masking (models/layers.mask_valid_hw,
threaded as im_hw) plus RoIAlign valid_hw border logic must make padded
and unpadded execution match to fp32 round-off — including proposals
touching the image border.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cim_tpu.config import clone_cfg, load_cfg
from cim_tpu.models.builder import build_model

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _edge_case(rng, h, w, n=12):
    """Image + proposals, several touching the right/bottom borders."""
    image = rng.randn(h, w, 3).astype(np.float32)
    rois = np.stack(
        [
            rng.uniform(0, w * 0.5, n),
            rng.uniform(0, h * 0.5, n),
            rng.uniform(w * 0.6, w - 1, n),
            rng.uniform(h * 0.6, h - 1, n),
        ],
        -1,
    ).astype(np.float32)
    rois[0] = [0, 0, w - 1, h - 1]  # full-image proposal
    rois[1] = [w * 0.7, h * 0.7, w - 1, h - 1]  # bottom-right corner
    masks = (rng.rand(n, 7, 7) > 0.5).astype(np.float32)
    valid = np.ones(n, bool)
    return image, rois, masks, valid


def _build(conv_body, use_bn_stats_rng=None):
    cfg = clone_cfg(load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml")))
    cfg.MODEL.CONV_BODY = conv_body
    cfg.TPU.PRECISION = "f32"
    cfg.TPU.REMAT_BOX_HEAD = False
    return build_model(cfg)


@pytest.mark.parametrize(
    "conv_body,hw",
    [
        ("tiny.conv_body", (64, 80)),
        ("vgg16.dilated_conv5_body", (64, 80)),
        ("resnet50.torch_resnet50", (96, 128)),
    ],
)
def test_zero_padding_preserves_scores_incl_border(rng, conv_body, hw):
    import cim_tpu.models.tiny  # noqa: F401

    model = _build(conv_body)
    h, w = hw
    image, rois, masks, valid = _edge_case(rng, h, w)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(image), jnp.asarray(rois),
        jnp.asarray(masks), jnp.asarray(valid),
    )
    if "stats" in variables:
        # non-trivial BN statistics: fresh mean-0/var-1 BN is an affine
        # identity and would mask the pad-region bleed this test guards
        import flax

        flat = flax.traverse_util.flatten_dict(variables["stats"])
        keyed = {
            k: jnp.asarray(
                rng.uniform(0.5, 1.5, v.shape).astype(np.float32)
                if k[-1] == "var"
                else rng.randn(*v.shape).astype(np.float32) * 0.1
            )
            for k, v in flat.items()
        }
        variables = dict(variables)
        variables["stats"] = flax.traverse_util.unflatten_dict(keyed)

    def scores(im, im_hw):
        out = model.apply(
            variables, jnp.asarray(im), jnp.asarray(rois),
            jnp.asarray(masks), jnp.asarray(valid), im_hw=im_hw,
        )
        return np.asarray(out["refine_cls"] * out["refine_iou"])

    base = scores(image, None)
    padded = np.zeros((128, 256, 3), np.float32)
    padded[:h, :w] = image
    got = scores(padded, (h, w))
    np.testing.assert_allclose(got, base, rtol=2e-5, atol=1e-7)
