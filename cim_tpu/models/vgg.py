"""Dilated VGG-16 backbone (flax.linen, NHWC).

Architecture contract: reference lib/modeling/vgg16.py:34-132
(dilated_conv5_body): 13 3x3 convs in 5 groups; max-pool only after
conv1/conv2/conv3 (stride 1/8); conv5 uses dilation 2 / padding 2.
dim_out 512. FREEZE_AT handled by the optimizer mask
(cim_tpu/engine/optimizer.py), as in reference :86-89.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from cim_tpu.models.layers import (
    TorchConv,
    floor_div_hw,
    mask_valid_hw,
    max_pool_torch,
)


class DilatedVGG16(nn.Module):
    dtype: Any = None

    dim_out: int = 512
    spatial_scale: float = 1.0 / 8.0

    @nn.compact
    def __call__(self, x, valid_hw=None):
        cfg_chans = {
            "conv1": (64, 64),
            "conv2": (128, 128),
            "conv3": (256, 256, 256),
            "conv4": (512, 512, 512),
            "conv5": (512, 512, 512),
        }
        for group, chans in cfg_chans.items():
            dilation = 2 if group == "conv5" else 1
            pad = 2 if group == "conv5" else 1
            for j, ch in enumerate(chans):
                # every conv has a bias -> the zero-pad region drifts;
                # re-zero it before each spatial conv (layers.mask_valid_hw)
                x = mask_valid_hw(x, valid_hw)
                x = TorchConv(
                    ch, (3, 3), padding=pad, dilation=dilation,
                    dtype=self.dtype, name=f"{group}_{j}",
                )(x)
                x = nn.relu(x)
            if group in ("conv1", "conv2", "conv3"):
                x = mask_valid_hw(x, valid_hw)
                x = max_pool_torch(x, 2, 2, 0)
                # maxpool k2 s2 p0 drops a trailing odd row: floor(v/2)
                valid_hw = floor_div_hw(valid_hw, 2)
        return mask_valid_hw(x, valid_hw)

    @staticmethod
    def feature_valid_hw(im_hw):
        if im_hw is None:
            return None
        return (im_hw[0] // 8, im_hw[1] // 8)


def frozen_param_paths(freeze_at: int):
    return [f"conv{i}" for i in range(1, freeze_at + 1)]
