"""End-to-end learning signal: on a color-coded synthetic task the full
pipeline (backbone -> MaskFuse -> heads -> CIM mining -> losses -> SGD)
must actually learn. The reference ships no such test (SURVEY.md §4)."""
import os

import numpy as np
import jax
import pytest

from cim_tpu.config import clone_cfg, load_cfg
from cim_tpu.data.synthetic import mask_matrices, masks_to_7x7
from cim_tpu.engine.train import Trainer

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

PALETTE = np.array(
    [[1.0, 0.1, 0.1], [0.1, 1.0, 0.1], [0.1, 0.1, 1.0], [1.0, 1.0, 0.1]],
    np.float32,
)


def _color_task_microbatch(rng, cls, n_props=24, hw=48):
    """One image: a colored square of class `cls` + distractor proposals."""
    image = rng.rand(hw, hw, 3).astype(np.float32) * 0.1
    # true object: a colored square
    y0, x0 = rng.randint(4, hw - 20, 2)
    size = rng.randint(12, 16)
    image[y0 : y0 + size, x0 : x0 + size] = PALETTE[cls] + rng.rand(3) * 0.05

    masks = np.zeros((n_props, hw, hw), bool)
    boxes = np.zeros((n_props, 4), np.float32)
    # proposal 0 = the true object; rest random
    masks[0, y0 : y0 + size, x0 : x0 + size] = True
    boxes[0] = [x0, y0, x0 + size - 1, y0 + size - 1]
    for i in range(1, n_props):
        py, px = rng.randint(0, hw - 10, 2)
        s = rng.randint(6, 14)
        masks[i, py : py + min(s, hw - py), px : px + min(s, hw - px)] = True
        ys, xs = np.nonzero(masks[i])
        boxes[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    iou, asy = mask_matrices(masks)

    labels = np.zeros(20, np.float32)
    labels[cls] = 1
    mat = np.zeros((n_props, 21), np.int32)
    mat[0, cls + 1] = 1  # the true proposal forms cluster 1

    return {
        "image": image,
        "rois": boxes,
        "masks": masks_to_7x7(masks, boxes).astype(np.float32),
        "valid": np.ones(n_props, bool),
        "labels": labels,
        "mat": mat,
        "iou_map": iou.astype(np.float16),
        "asy_iou_map": asy.astype(np.float16),
    }


@pytest.mark.slow
def test_pipeline_learns_color_task(rng):
    import cim_tpu.models.tiny  # noqa: F401

    cfg = clone_cfg(load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml")))
    cfg.MODEL.CONV_BODY = "tiny.conv_body"
    cfg.TPU.PROPOSAL_PAD = 24
    cfg.TPU.MAX_CLUSTERS = 4
    cfg.TPU.DATA_PARALLEL = 1
    cfg.TPU.GRAD_ACCUM = 2
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARM_UP_ITERS = 5
    cfg.SOLVER.STEPS = [0]

    sample = _color_task_microbatch(rng, 0)
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)

    def batch(step_rng):
        mbs = [
            _color_task_microbatch(step_rng, int(step_rng.randint(0, 3)))
            for _ in range(2)
        ]
        return {
            k: np.stack([np.stack([mb[k] for mb in mbs])]) for k in mbs[0]
        }

    losses = []
    for step in range(40):
        m = trainer.step(batch(rng), jax.random.PRNGKey(step))
        losses.append(float(m["total_loss"]))
    first = np.median(losses[:8])
    last = np.median(losses[-8:])
    assert np.isfinite(losses).all()
    assert last < first, (first, last)
    assert last < 0.85 * first, f"no learning signal: {first:.3f} -> {last:.3f}"
