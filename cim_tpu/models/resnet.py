"""ResNet-50-C4 backbone (flax.linen, NHWC).

Architecture contract: reference lib/modeling/resnet50.py:17-91 — the
torchvision resnet50 trunk cut after layer3 (res4): conv1/bn/relu/maxpool +
layer1(3 bottlenecks, 256) + layer2(4, 512, /2) + layer3(6, 1024, /2);
dim_out 1024, stride 1/16. BatchNorm is permanently frozen (eval mode,
reference :63-77) — here FrozenBatchNorm with constant statistics.
Stage freezing (FREEZE_AT, reference :53-57) is enforced by the optimizer
parameter mask, see cim_tpu/engine/optimizer.py.

Stride placement follows torchvision's resnet50 (v1.5): the 3x3 conv of the
first bottleneck in a stage carries the stride.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cim_tpu.models.layers import (
    FrozenBatchNorm,
    TorchConv,
    ceil_div_hw,
    mask_valid_hw,
    max_pool_torch,
    torch_kaiming_uniform,
)


class _StemKernel(nn.Module):
    """Owns the stem conv kernel at the exact param path TorchConv would
    create (``<parent>/conv/kernel``), so checkpoints, the torch weight
    loader and the optimizer mask are identical whichever stem path runs."""

    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        fan_in = self.shape[0] * self.shape[1] * self.shape[2]
        return self.param(
            "kernel", torch_kaiming_uniform(fan_in), tuple(self.shape),
            jnp.float32,
        )


class S2DStemConv(nn.Module):
    """7x7/s2/p3 bias-free stem conv computed as a 4x4/s1 conv on the 2x2
    space-to-depth input (MLPerf ResNet space-to-depth optimization).

    Exactly the same arithmetic as the plain conv, re-laid-out: every
    output tap reads the same 7x7xC window of the same image through the
    same weights — only the loop order the MXU sees changes. C_in=3 leaves
    a 7x7 conv's systolic-array input lanes ~99% idle; folding the 2x2
    pixel block into channels (C_in=12, 4x4 kernel) quadruples that and
    halves the spatial extent XLA must tile. Derivation: with
    u = 2i + di - 3 written as 2(i+s) + a (a in {0,1}), di in 0..6 maps to
    (s, a) in {-2..1}x{0,1} minus (-2, 0) — i.e. the 7x7 kernel padded
    top/left by one zero row/col, viewed as 4x4 blocks of 2x2 parities,
    convolved stride-1 over space-to-depth(x) with asymmetric pad (2, 1).

    Odd H/W inputs are zero-padded to even first — bit-identical, because
    the rows/cols a 7x7/p3 conv reads past the image are zeros either way
    (conv zero-padding vs explicit zeros). The parameter stays the
    canonical (7, 7, C, F) tensor; the re-layout happens under jit where
    XLA constant-folds it once per compile.
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if x.shape[1] % 2 or x.shape[2] % 2:
            x = jnp.pad(
                x, ((0, 0), (0, x.shape[1] % 2), (0, x.shape[2] % 2), (0, 0))
            )
        n, h, w, c = x.shape
        kernel = _StemKernel((7, 7, c, self.features), name="conv")()
        # input: (N, H, W, C) -> (N, H/2, W/2, 4C), channel = (a*2+b)*C + ch
        y = x.reshape(n, h // 2, 2, w // 2, 2, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        # kernel: zero-pad 7x7 -> 8x8 at top/left (the absent (s=-2, a=0)
        # tap), then the same block-of-parities re-layout as the input
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k4 = (
            k8.reshape(4, 2, 4, 2, c, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * c, self.features)
        )
        if self.dtype is not None:
            y = y.astype(self.dtype)
            k4 = k4.astype(self.dtype)
        return jax.lax.conv_general_dilated(
            y, k4, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class Bottleneck(nn.Module):
    planes: int  # mid width; out = 4 * planes
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, valid_hw=None):
        out = TorchConv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        # conv2 is the only spatial (3x3) conv: zero the pad region the
        # preceding BN re-polluted (see layers.mask_valid_hw)
        out = mask_valid_hw(out, valid_hw)
        out = TorchConv(
            self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = TorchConv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)

        if self.downsample:
            identity = TorchConv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(identity)
        else:
            identity = x
        return nn.relu(out + identity)


class ResNetStage(nn.Module):
    planes: int
    blocks: int
    stride: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, valid_hw=None):
        x = Bottleneck(
            self.planes, stride=self.stride, downsample=True, dtype=self.dtype,
            name="block0",
        )(x, valid_hw)
        if self.stride != 1:
            valid_hw = ceil_div_hw(valid_hw, self.stride)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, dtype=self.dtype, name=f"block{i}")(
                x, valid_hw
            )
        return x


class ResNet50C4(nn.Module):
    """Stages res1..res4; returns the stride-16, 1024-channel feature map."""

    block_counts: Sequence[int] = (3, 4, 6)
    dtype: Any = None
    s2d_stem: bool = False  # cfg.TPU.SPACE_TO_DEPTH_STEM (see S2DStemConv)

    dim_out: int = 1024
    spatial_scale: float = 1.0 / 16.0

    @nn.compact
    def __call__(self, x, valid_hw=None):
        # res1: 7x7/2 + maxpool 3x3/2 (image pad is exact zeros -> the
        # bias-free conv needs no input mask; BN output does, before pool)
        if self.s2d_stem:
            x = S2DStemConv(64, dtype=self.dtype, name="res1_conv")(x)
        else:
            x = TorchConv(
                64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                dtype=self.dtype, name="res1_conv",
            )(x)
        x = FrozenBatchNorm(64, name="res1_bn")(x)
        x = nn.relu(x)
        valid_hw = ceil_div_hw(valid_hw, 2)
        x = mask_valid_hw(x, valid_hw)
        x = max_pool_torch(x, 3, 2, 1)
        valid_hw = ceil_div_hw(valid_hw, 2)
        # res2..res4 (+ optional res5 for the full classification trunk)
        x = ResNetStage(64, self.block_counts[0], 1, dtype=self.dtype, name="res2")(x, valid_hw)
        x = ResNetStage(128, self.block_counts[1], 2, dtype=self.dtype, name="res3")(x, valid_hw)
        valid_hw = ceil_div_hw(valid_hw, 2)
        x = ResNetStage(256, self.block_counts[2], 2, dtype=self.dtype, name="res4")(x, valid_hw)
        valid_hw = ceil_div_hw(valid_hw, 2)
        if len(self.block_counts) > 3:
            x = ResNetStage(
                512, self.block_counts[3], 2, dtype=self.dtype, name="res5"
            )(x, valid_hw)
            valid_hw = ceil_div_hw(valid_hw, 2)
        # final mask: downstream RoIAlign reads only clean zeros in the pad
        return mask_valid_hw(x, valid_hw)

    @staticmethod
    def feature_valid_hw(im_hw):
        """Valid feature extent for an (h, w) image: ceil(v/2) per stride-2
        stage (conv7 s2 p3 and maxpool3 s2 p1 both give ceil)."""
        if im_hw is None:
            return None
        return (
            (im_hw[0] + 15) // 16,
            (im_hw[1] + 15) // 16,
        )


def frozen_param_paths(freeze_at: int):
    """Flattened-path prefixes whose params must not train, matching the
    reference's FREEZE_AT loop (resnet50.py:53-57). BN statistics are
    frozen structurally (stats collection)."""
    prefixes = []
    for i in range(1, freeze_at + 1):
        prefixes.append(f"res{i}")
    return prefixes
