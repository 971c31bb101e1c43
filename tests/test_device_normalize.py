"""Device-side ToTensor normalization == host normalization (the
Evaluator ships uint8 and normalizes in-jit, masking the pad region)."""
import os

import numpy as np
import jax

from cim_tpu.config import clone_cfg, load_cfg
from cim_tpu.data.synthetic import make_microbatch
from cim_tpu.engine.test import Evaluator
from cim_tpu.engine.train import Trainer

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_uint8_device_norm_matches_host_norm(rng):
    import cim_tpu.models.tiny  # noqa: F401

    cfg = clone_cfg(load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml")))
    cfg.MODEL.CONV_BODY = "tiny.conv_body"
    cfg.TPU.PRECISION = "f32"
    cfg.TEST.BBOX_AUG.ENABLED = False
    cfg.TEST.SCALE = 96

    sample = make_microbatch(rng, image_hw=(64, 64), n_props=16, n_valid=16)
    saved = cfg.TPU.PROPOSAL_PAD
    cfg.TPU.PROPOSAL_PAD = 16
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)
    cfg.TPU.PROPOSAL_PAD = saved
    variables = {"params": trainer.state.params, "stats": trainer.stats}

    im = (rng.rand(96, 120, 3) * 255).astype(np.uint8)
    n = 10
    x1 = rng.uniform(0, 40, n).astype(np.float32)
    y1 = rng.uniform(0, 40, n).astype(np.float32)
    boxes = np.stack([x1, y1, x1 + 40, y1 + 40], -1).astype(np.float32)
    masks = (rng.rand(n, 7, 7) > 0.5).astype(np.float32)

    # device-norm path (transform_mode == ToTensor ships uint8)
    ev = Evaluator(cfg, trainer.model, variables)
    s_dev, _ = ev.im_detect_bbox(im, boxes, masks, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)

    # host-norm reference: resize the uint8 image on the host, normalize
    # with prep_image(ToTensor), then feed the float image through the
    # 'org' path with zero pixel means (a pure passthrough at scale 1)
    from cim_tpu.data.transforms import (
        prep_image,
        prep_image_uint8_rgb,
        scale_for_target,
    )

    s = scale_for_target(im.shape[:2], cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)
    im_resized = prep_image_uint8_rgb(im, s)[:, :, ::-1]  # back to BGR uint8
    imf2 = prep_image(np.ascontiguousarray(im_resized), 1.0, "ToTensor")
    cfg3 = clone_cfg(cfg)
    cfg3.transform_mode = "org"
    cfg3.PIXEL_MEANS = np.zeros((1, 1, 3))
    cfg3.TEST.SCALE = max(imf2.shape[:2])
    ev3 = Evaluator(cfg3, trainer.model, variables)
    s_host, _ = ev3.im_detect_bbox(
        imf2, boxes * s, masks, max(imf2.shape[:2]), cfg.TEST.MAX_SIZE
    )

    np.testing.assert_allclose(s_dev, s_host, rtol=2e-4, atol=1e-6)
