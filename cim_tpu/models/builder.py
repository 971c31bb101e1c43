"""Top-level CIM model (the reference's Generalized_RCNN,
lib/modeling/model_builder.py:71-263, re-designed functional).

Differences by design:
- pure flax module: forward returns head scores only; mining + losses are
  pure functions applied in the train step (cim_tpu/engine/train.py) —
  the reference loads per-image IoU pickles *inside* forward
  (model_builder.py:147-159); here those matrices arrive with the batch
  from the host input pipeline;
- the cfg string factory (model_builder.get_func :16) maps to static
  module selection below;
- single padded proposal tensor (N_max, ...) + validity mask instead of
  dynamic per-image proposal counts.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from cim_tpu.models.heads import ClsIouHead
from cim_tpu.models.mask_fuse import MaskFuse
from cim_tpu.models.resnet import ResNet50C4
from cim_tpu.models.resnet import frozen_param_paths as resnet_frozen
from cim_tpu.models.vgg import DilatedVGG16
from cim_tpu.models.vgg import frozen_param_paths as vgg_frozen

BACKBONES = {
    # reference cfg.MODEL.CONV_BODY strings -> constructors
    "resnet50.torch_resnet50": ResNet50C4,
    "vgg16.dilated_conv5_body": DilatedVGG16,
    # HRNet registered by cim_tpu.models.hrnet at import (heavier module)
}


def register_backbone(name, ctor):
    BACKBONES[name] = ctor


class CIMModel(nn.Module):
    """Conv body -> MaskFuse -> cls/iou heads.

    __call__(image (H, W, 3), rois (N, 4), masks (N, 7, 7), valid (N,))
      -> dict with predict_cls/predict_det (N, C+1),
         refine_cls/refine_iou (K, N, C+1).
    """

    conv_body: str = "resnet50.torch_resnet50"
    num_classes: int = 20
    refine_times: int = 3
    mlp_head_dim: int = 4096
    roi_size: int = 7
    roi_method: str = "RoIAlign"
    sampling_ratio: int = 0
    max_adaptive_grid: int = 2
    remat_backbone: bool = False
    remat_box_head: bool = True
    use_pallas_roi_align: bool = False
    compute_dtype: Any = jnp.float32
    int8_eval: bool = False  # dynamic w8a8 head matmuls (eval-only)
    conv_im2col: bool = False  # GEMM spelling of the head conv (CPU anchor)
    s2d_stem: bool = False  # space-to-depth resnet stem (TPU; same params)

    def setup(self):
        try:
            ctor = BACKBONES[self.conv_body]
        except KeyError:
            # lazy self-registering modules (HRNet.get_HRNet, tiny.conv_body)
            import importlib

            mod = self.conv_body.split(".")[0].lower()
            try:
                importlib.import_module(f"cim_tpu.models.{mod}")
                ctor = BACKBONES[self.conv_body]
            except (ImportError, KeyError):
                raise ValueError(f"Unknown CONV_BODY: {self.conv_body}")
        body_kwargs = {}
        if self.s2d_stem and "s2d_stem" in getattr(
            ctor, "__dataclass_fields__", {}
        ):
            body_kwargs["s2d_stem"] = True  # resnet bodies only
        if self.remat_backbone:
            # trade FLOPs for HBM on large TTA scales (jax.checkpoint)
            ctor = nn.remat(ctor)
        self.backbone = ctor(
            dtype=self.compute_dtype, name="conv_body", **body_kwargs
        )
        # remat the box head: its RoIAlign/concat intermediates dominate
        # HBM at N_max proposals; recompute in backward instead of saving
        head_ctor = nn.remat(MaskFuse) if self.remat_box_head else MaskFuse
        self.box_head = head_ctor(
            dim_in=BACKBONES[self.conv_body].dim_out,
            spatial_scale=BACKBONES[self.conv_body].spatial_scale,
            hidden_dim=self.mlp_head_dim,
            roi_size=self.roi_size,
            roi_method=self.roi_method,
            sampling_ratio=self.sampling_ratio,
            max_adaptive_grid=self.max_adaptive_grid,
            use_pallas=self.use_pallas_roi_align,
            dtype=self.compute_dtype,
            int8_eval=self.int8_eval,
            conv_im2col=self.conv_im2col,
            name="box_head",
        )
        self.cls_iou = ClsIouHead(
            num_classes=self.num_classes,
            refine_times=self.refine_times,
            name="cls_iou",
        )

    def convbody_net(self, image, im_hw=None):
        """Conv body only (reference Generalized_RCNN.convbody_net,
        model_builder.py:235-239) — apply with method=CIMModel.convbody_net."""
        x = image.astype(self.compute_dtype)[None]
        return self.backbone(x, im_hw)[0].astype(jnp.float32)

    def __call__(self, image, rois, masks, valid, im_hw=None) -> Dict[str, jax.Array]:
        """im_hw: optional (h, w) true image extent when ``image`` is a
        zero-padded bucket — threads valid-extent masking through the
        backbone and RoIAlign so padded and unpadded execution match
        (see cim_tpu.models.layers.mask_valid_hw)."""
        x = image.astype(self.compute_dtype)[None]  # (1, H, W, 3)
        feat = self.backbone(x, im_hw)[0]  # (h, w, C)
        # RoIAlign + heads in f32 (bilinear weights + softmax stability)
        feat = feat.astype(jnp.float32)
        feat_hw = BACKBONES[self.conv_body].feature_valid_hw(im_hw)
        seg_x = self.box_head(feat, rois, masks, feat_hw)
        predict_cls, predict_det, refine_cls, refine_iou = self.cls_iou(
            seg_x, valid
        )
        return {
            "predict_cls": predict_cls,
            "predict_det": predict_det,
            "refine_cls": refine_cls,
            "refine_iou": refine_iou,
            "blob_conv": feat,
        }


def build_model(cfg, eval_int8: bool = False) -> CIMModel:
    """Construct a CIMModel from a cim_tpu.config AttrDict.

    eval_int8 must stay False for training (jnp.round's zero gradient
    would silently freeze the head); engine.test.Evaluator rebuilds the
    module with eval_int8=cfg.TPU.EVAL_INT8 — same param tree, so the
    trainer's variables apply unchanged."""
    return CIMModel(
        int8_eval=eval_int8,
        conv_body=cfg.MODEL.CONV_BODY,
        num_classes=cfg.MODEL.NUM_CLASSES,
        refine_times=cfg.REFINE_TIMES,
        mlp_head_dim=cfg.FAST_RCNN.MLP_HEAD_DIM,
        roi_size=cfg.FAST_RCNN.ROI_XFORM_RESOLUTION,
        roi_method=cfg.FAST_RCNN.ROI_XFORM_METHOD,
        sampling_ratio=cfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO,
        max_adaptive_grid=cfg.TPU.MAX_ADAPTIVE_GRID,
        remat_backbone=cfg.TPU.REMAT_BACKBONE,
        remat_box_head=cfg.TPU.REMAT_BOX_HEAD,
        use_pallas_roi_align=cfg.TPU.PALLAS_ROI_ALIGN,
        conv_im2col=cfg.TPU.CONV_IM2COL,
        s2d_stem=bool(cfg.TPU.get("SPACE_TO_DEPTH_STEM", False)),
        compute_dtype=jnp.bfloat16
        if cfg.TPU.PRECISION == "bf16_compute"
        else jnp.float32,
    )


def frozen_paths_for(cfg):
    """Parameter path prefixes (under 'conv_body') to freeze, mirroring
    FREEZE_AT (reference resnet50.py:53-57, vgg16.py:86-89)."""
    body = cfg.MODEL.CONV_BODY
    if body.startswith("resnet50"):
        return resnet_frozen(cfg.ResNet.FREEZE_AT)
    if body.startswith("vgg16"):
        return vgg_frozen(cfg.VGG.FREEZE_AT)
    if body.startswith("HRNet"):
        from cim_tpu.models.hrnet import frozen_param_paths

        return frozen_param_paths(cfg.HRNET.FREEZE_AT)
    return []
