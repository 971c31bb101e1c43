"""Tiny conv body for smoke tests / CI.

Stride-16, 32-channel feature map via four stride-2 convs. Registered as
``tiny.conv_body`` so any engine (train/eval/bench) can exercise the full
pipeline without resnet-scale compile times. No reference counterpart —
the reference has no test backbone (or tests); this fills that gap in the
test pyramid (SURVEY.md §4).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from cim_tpu.models.layers import TorchConv, ceil_div_hw, mask_valid_hw


class TinyConvBody(nn.Module):
    dtype: Any = None

    dim_out: int = 32
    spatial_scale: float = 1.0 / 16.0

    @nn.compact
    def __call__(self, x, valid_hw=None):
        for i, ch in enumerate((8, 16, 32, 32)):
            x = mask_valid_hw(x, valid_hw)  # conv bias pollutes the pad
            x = TorchConv(
                ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            valid_hw = ceil_div_hw(valid_hw, 2)
        return mask_valid_hw(x, valid_hw)

    @staticmethod
    def feature_valid_hw(im_hw):
        if im_hw is None:
            return None
        return ((im_hw[0] + 15) // 16, (im_hw[1] + 15) // 16)


def register():
    from cim_tpu.models.builder import register_backbone

    register_backbone("tiny.conv_body", TinyConvBody)


register()
