"""Regression tests for round-2 review findings.

Covers: Trainer.set_stats rebuilding the compiled step (loaded frozen-BN
stats must reach the jitted loss, not just the checkpoint writer), the
HRNet branch of convert_reference_checkpoint, and rle.merge on an empty
segmentation list.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from cim_tpu.config import clone_cfg, load_cfg
from cim_tpu.data.synthetic import make_microbatch
from cim_tpu.engine.train import Trainer

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


class BNConvBody(nn.Module):
    """Tiny stride-16 body with one FrozenBatchNorm so the stats
    collection is non-empty (resnet-style engine plumbing at test size)."""

    dtype: object = None
    dim_out: int = 16
    spatial_scale: float = 1.0 / 16.0

    @nn.compact
    def __call__(self, x, valid_hw=None):
        from cim_tpu.models.layers import FrozenBatchNorm, TorchConv, \
            mask_valid_hw

        x = TorchConv(16, (3, 3), strides=(16, 16), padding=1,
                      name="conv0")(x)
        x = FrozenBatchNorm(16, name="bn0")(x)
        x = nn.relu(x)
        from cim_tpu.models.layers import ceil_div_hw
        return mask_valid_hw(x, ceil_div_hw(valid_hw, 16))

    @staticmethod
    def feature_valid_hw(im_hw):
        if im_hw is None:
            return None
        return ((im_hw[0] + 15) // 16, (im_hw[1] + 15) // 16)


def _bn_cfg():
    from cim_tpu.models.builder import register_backbone

    register_backbone("testbn.conv_body", BNConvBody)
    cfg = clone_cfg(load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml")))
    cfg.MODEL.CONV_BODY = "testbn.conv_body"
    cfg.TPU.PROPOSAL_PAD = 32
    cfg.TPU.GRAD_ACCUM = 1
    cfg.TPU.DATA_PARALLEL = 1
    cfg.TPU.MAX_CLUSTERS = 8
    cfg.TPU.PRECISION = "f32"
    return cfg


def test_set_stats_rebuilds_compiled_step():
    """tools/train.py --load_detectron/--load_ckpt replace the frozen-BN
    stats AFTER Trainer.__init__ captured them into the jitted step;
    set_stats must rebuild the step so the loaded stats take effect."""
    cfg = _bn_cfg()
    rng = np.random.RandomState(0)
    kw = dict(image_hw=(64, 64), n_props=32, n_valid=20,
              num_classes=cfg.MODEL.NUM_CLASSES)
    mb = make_microbatch(rng, **kw)
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=mb)
    assert jax.tree.leaves(trainer.stats), "BN body must expose stats"

    key = jax.random.PRNGKey(7)
    l0 = float(jax.jit(trainer.loss_fn)(trainer.state.params, mb, key)[0])

    # loaded stats with a very different variance must change the loss
    shifted = jax.tree.map(lambda x: x + 3.0, trainer.stats)
    trainer.set_stats(shifted)
    l1 = float(jax.jit(trainer.loss_fn)(trainer.state.params, mb, key)[0])
    assert l0 != l1

    # and the full compiled step consumes them too (smoke: runs + finite)
    batch = jax.tree.map(lambda x: np.asarray(x)[None, None], mb)
    m = trainer.step(batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["total_loss"]))


def test_convert_reference_checkpoint_hrnet_body():
    """HRNet CIM checkpoints (Conv_Body.* = HRNetV2-W48 names) must route
    through convert_hrnet_w48, not the resnet50 remap (reference
    hrnet_weights_helper.py:15-39)."""
    from cim_tpu.utils import torch_weights as tw
    from tests.test_hrnet_weights import _w48_state_dict

    rng = np.random.RandomState(0)
    body_sd = _w48_state_dict(rng)
    sd = {f"Conv_Body.{k}": v for k, v in body_sd.items()}

    class FT:
        def __init__(self, a):
            self.a = np.asarray(a, np.float32)

        def detach(self):
            return self

        def cpu(self):
            return self

        def numpy(self):
            return self.a

    # minimal MaskFuse + cls_iou heads
    sd["Box_Head.mask_branch.0.weight"] = FT(rng.randn(1, 721, 3, 3))
    sd["Box_Head.mask_branch.0.bias"] = FT(rng.randn(1))
    sd["Box_Head.seg_fc.0.weight"] = FT(rng.randn(4096, 720 * 49))
    sd["Box_Head.seg_fc.0.bias"] = FT(rng.randn(4096))
    sd["Box_Head.seg_fc.2.weight"] = FT(rng.randn(4096, 4096))
    sd["Box_Head.seg_fc.2.bias"] = FT(rng.randn(4096))
    for name in ("classifier", "detector"):
        sd[f"cls_iou_model.{name}.weight"] = FT(rng.randn(21, 4096))
        sd[f"cls_iou_model.{name}.bias"] = FT(rng.randn(21))
    for k in range(3):
        for br in ("refine_cls", "refine_iou"):
            sd[f"cls_iou_model.{br}.{k}.weight"] = FT(rng.randn(21, 4096))
            sd[f"cls_iou_model.{br}.{k}.bias"] = FT(rng.randn(21))

    out = tw.convert_reference_checkpoint(sd, "hrnet48", refine_times=3)
    want = tw.convert_hrnet_w48(body_sd)
    jax.tree.map(
        np.testing.assert_array_equal,
        out["params"]["conv_body"], want["params"],
    )
    jax.tree.map(
        np.testing.assert_array_equal,
        out["stats"]["conv_body"], want["stats"],
    )


def test_merge_empty_rle_list():
    """pycocotools mask.merge([]) yields a size-[0,0] empty RLE; an
    annotation with "segmentation": [] must not crash evaluation."""
    from cim_tpu.evaluation import rle

    r = rle.merge([])
    assert list(r["size"]) == [0, 0]
    assert rle.fr_poly_objects([], 7, 9) is not None
