"""MaskFuse box head (flax.linen).

Behavior contract: reference lib/modeling/resnet50.py:94-138 (near-identical
copies exist per backbone at vgg16.py:135-179 and HRNet.py:588-632; one
parametrized module here serves all three):

  box_x  = RoIAlign(features, rois)                  (N, 7, 7, C)
  mask_x = box_x * proposal_mask                     7x7 COB mask gating
  y      = Conv3x3(concat[box_x, mask_x]) -> ReLU    2C -> C
  seg_x  = FC(C*49 -> 4096) -> ReLU -> FC(4096 -> 4096) -> ReLU

TPU notes: channel-last layout; the RoIAlign is the XLA op from
cim_tpu.ops (Pallas kernel swap-in point); everything downstream is a
batched matmul over N proposals — MXU-friendly.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from cim_tpu.models.layers import TorchConv, TorchLinear
from cim_tpu.ops.roi_align import roi_align, roi_pool


class MaskFuse(nn.Module):
    dim_in: int
    spatial_scale: float
    hidden_dim: int = 4096
    roi_size: int = 7
    roi_method: str = "RoIAlign"
    sampling_ratio: int = 0
    max_adaptive_grid: int = 2
    use_pallas: bool = False  # Pallas separable-matmul kernel (TPU)
    dtype: Any = None
    # dynamic w8a8 for the conv + fc1 (the head's dominant FLOPs; v5e int8
    # MXU = 2x bf16). Eval-only — round() kills gradients (ops/quant.py)
    int8_eval: bool = False
    # GEMM spelling of the conv (cfg.TPU.CONV_IM2COL): same math/params;
    # avoids XLA:CPU's naive weight-grad conv fallback (layers._Im2ColConv)
    conv_im2col: bool = False

    dim_out: int = 4096

    @nn.compact
    def __call__(self, features, rois, masks, valid_hw=None):
        """features: (H, W, C); rois: (N, 4) image coords; masks: (N, 7, 7);
        valid_hw: optional true feature extent inside a padded bucket."""
        if self.dtype is not None:
            # bf16 RoIAlign: weights stay f32 inside the op; the (N, R, R, C)
            # value tensors (the model's largest) are stored in bf16
            features = features.astype(self.dtype)
        if self.roi_method == "RoIAlign":
            if self.use_pallas:
                from cim_tpu.ops.pallas.roi_align_kernel import roi_align_pallas

                box_x = roi_align_pallas(
                    features,
                    rois,
                    self.roi_size,
                    self.spatial_scale,
                    self.sampling_ratio,
                    max(self.max_adaptive_grid, 4),
                    valid_hw=valid_hw,
                )
            else:
                box_x = roi_align(
                    features,
                    rois,
                    output_size=self.roi_size,
                    spatial_scale=self.spatial_scale,
                    sampling_ratio=self.sampling_ratio,
                    aligned=True,
                    max_adaptive_grid=self.max_adaptive_grid,
                    valid_hw=valid_hw,
                )
        elif self.roi_method == "RoIPoolF":
            box_x = roi_pool(
                features, rois, output_size=self.roi_size,
                spatial_scale=self.spatial_scale, valid_hw=valid_hw,
            )
        else:
            raise ValueError(f"Unknown pooling method: {self.roi_method}")

        # cast to the compute dtype BEFORE the concat: the (N, 7, 7, 2C)
        # intermediate is the largest activation of the model (1.6GB at
        # N=4096, C=1024 in f32) and would otherwise be saved for backward
        if self.dtype is not None:
            box_x = box_x.astype(self.dtype)
        masks = jnp.asarray(masks, box_x.dtype)[..., None]  # (N, 7, 7, 1)
        mask_x = box_x * masks
        x = jnp.concatenate([box_x, mask_x], axis=-1)  # (N, 7, 7, 2C)
        x = TorchConv(self.dim_in, (3, 3), padding=1, dtype=self.dtype,
                      int8=self.int8_eval, im2col=self.conv_im2col,
                      name="mask_branch")(x)
        x = nn.relu(x)
        # match the torch NCHW flatten order (C, H, W) for weight-porting
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.relu(TorchLinear(self.hidden_dim, dtype=self.dtype,
                                int8=self.int8_eval, name="seg_fc1")(x))
        x = nn.relu(TorchLinear(self.hidden_dim, dtype=self.dtype, name="seg_fc2")(x))
        x = x.astype(jnp.float32)
        return x
