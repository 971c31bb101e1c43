"""Bucket zero-padding exactness: conv zero-padding makes extending the
image with zeros a no-op for interior features, so Evaluator scores must
be identical with and without padding (the basis of shape-bucketed TTA)."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from cim_tpu.config import clone_cfg, load_cfg
from cim_tpu.models.builder import build_model

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_zero_padding_preserves_interior_scores(rng):
    import cim_tpu.models.tiny  # noqa: F401

    cfg = clone_cfg(load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml")))
    cfg.MODEL.CONV_BODY = "tiny.conv_body"
    cfg.TPU.PRECISION = "f32"
    model = build_model(cfg)

    h, w, n = 64, 80, 16
    image = rng.randn(h, w, 3).astype(np.float32)
    x1 = rng.uniform(0, 30, n).astype(np.float32)
    y1 = rng.uniform(0, 30, n).astype(np.float32)
    rois = np.stack([x1, y1, x1 + 24, y1 + 24], -1).astype(np.float32)
    masks = (rng.rand(n, 7, 7) > 0.5).astype(np.float32)
    valid = np.ones(n, bool)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(image), jnp.asarray(rois),
        jnp.asarray(masks), jnp.asarray(valid),
    )

    def scores(im):
        out = model.apply(
            variables, jnp.asarray(im), jnp.asarray(rois),
            jnp.asarray(masks), jnp.asarray(valid),
        )
        return np.asarray(out["refine_cls"] * out["refine_iou"])

    base = scores(image)
    padded = np.zeros((128, 128, 3), np.float32)
    padded[:h, :w] = image
    got = scores(padded)
    np.testing.assert_allclose(got, base, rtol=2e-4, atol=1e-6)
