"""HRNet-W48 (HRNetV2 classification variant) backbone, flax/NHWC.

Architecture contract: reference lib/modeling/HRNet.py:110-645 —
stem (two stride-2 3x3 convs) -> layer1 (4 bottlenecks, 256ch) ->
3 multi-resolution stages with transition layers and SUM fuse ->
classification head: per-resolution bottleneck "incre" modules + strided
"downsamp" chain + 1x1 final layer -> 2048 channels at stride 1/32.
Inputs are padded to multiples of 32 (reference :500-513). Stages up to
FREEZE_AT run frozen — handled by the optimizer parameter mask
(reference uses no_grad + requires_grad=False, :516-535).

All BatchNorms are FrozenBatchNorm (permanently eval, reference
freeze() :340-346).

Stage shape follows cfg.MODEL.EXTRA (configs/hrnet48_voc.yaml): W48 =
branch channels (48, 96, 192, 384), BASIC blocks, modules (1, 4, 3).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from cim_tpu.models.layers import FrozenBatchNorm, TorchConv, mask_valid_hw


def _conv_bn(x, features, kernel, stride, pad, dtype, name, relu=True):
    mod = TorchConv(
        features, (kernel, kernel), strides=(stride, stride), padding=pad,
        use_bias=False, dtype=dtype, name=f"{name}_conv",
    )
    x = mod(x)
    x = FrozenBatchNorm(features, name=f"{name}_bn")(x)
    return nn.relu(x) if relu else x


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None
    expansion = 1

    @nn.compact
    def __call__(self, x):
        out = _conv_bn(x, self.planes, 3, self.stride, 1, self.dtype, "c1")
        out = _conv_bn(out, self.planes, 3, 1, 1, self.dtype, "c2", relu=False)
        if self.downsample:
            x = _conv_bn(x, self.planes, 1, self.stride, 0, self.dtype, "ds",
                         relu=False)
        return nn.relu(out + x)


class HRBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None
    expansion = 4

    @nn.compact
    def __call__(self, x):
        out = _conv_bn(x, self.planes, 1, 1, 0, self.dtype, "c1")
        out = _conv_bn(out, self.planes, 3, self.stride, 1, self.dtype, "c2")
        out = _conv_bn(
            out, self.planes * 4, 1, 1, 0, self.dtype, "c3", relu=False
        )
        if self.downsample:
            x = _conv_bn(
                x, self.planes * 4, 1, self.stride, 0, self.dtype, "ds",
                relu=False,
            )
        return nn.relu(out + x)


_BLOCKS = {"BASIC": BasicBlock, "BOTTLENECK": HRBottleneck}


class HRModule(nn.Module):
    """One HighResolutionModule: parallel branches + full SUM fusion
    (reference HRNet.py:110-253)."""

    num_branches: int
    block: str
    num_blocks: Sequence[int]
    num_inchannels: Sequence[int]
    num_channels: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, xs):
        block_cls = _BLOCKS[self.block]
        outs = []
        for i in range(self.num_branches):
            x = xs[i]
            need_ds = (
                self.num_inchannels[i]
                != self.num_channels[i] * block_cls.expansion
            )
            x = block_cls(
                self.num_channels[i], downsample=need_ds, dtype=self.dtype,
                name=f"branch{i}_block0",
            )(x)
            for b in range(1, self.num_blocks[i]):
                x = block_cls(
                    self.num_channels[i], dtype=self.dtype,
                    name=f"branch{i}_block{b}",
                )(x)
            outs.append(x)
        if self.num_branches == 1:
            return outs

        chans = [
            self.num_channels[i] * block_cls.expansion
            for i in range(self.num_branches)
        ]
        fused = []
        for i in range(self.num_branches):
            y = None
            for j in range(self.num_branches):
                if j == i:
                    t = outs[j]
                elif j > i:
                    # 1x1 conv + BN + nearest-upsample 2^(j-i)
                    t = _conv_bn(
                        outs[j], chans[i], 1, 1, 0, self.dtype,
                        f"fuse{i}_{j}", relu=False,
                    )
                    scale = 2 ** (j - i)
                    t = jnp.repeat(jnp.repeat(t, scale, axis=1), scale, axis=2)
                else:
                    # chain of stride-2 3x3 convs
                    t = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_ch = chans[i] if last else chans[j]
                        t = _conv_bn(
                            t, out_ch, 3, 2, 1, self.dtype,
                            f"fuse{i}_{j}_{k}", relu=not last,
                        )
                y = t if y is None else y + t
            fused.append(nn.relu(y))
        return fused


class HRNetW48(nn.Module):
    """Full HRNetV2 classification trunk; dim_out 2048, stride 1/32."""

    stages: Any = None  # cfg.MODEL.EXTRA dict; None -> W48 defaults
    dtype: Any = None

    dim_out: int = 2048
    spatial_scale: float = 1.0 / 32.0

    @staticmethod
    def feature_valid_hw(im_hw):
        # no per-conv masking (see __call__ note): the feature pad region
        # is populated the same way the reference's pad-to-32 run is
        return None

    def _cfg(self):
        if self.stages:
            return self.stages
        return {
            "STAGE1": {"NUM_MODULES": 1, "NUM_BRANCHES": 1, "BLOCK": "BOTTLENECK",
                       "NUM_BLOCKS": [4], "NUM_CHANNELS": [64]},
            "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
                       "NUM_BLOCKS": [4, 4], "NUM_CHANNELS": [48, 96]},
            "STAGE3": {"NUM_MODULES": 4, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
                       "NUM_BLOCKS": [4, 4, 4], "NUM_CHANNELS": [48, 96, 192]},
            "STAGE4": {"NUM_MODULES": 3, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
                       "NUM_BLOCKS": [4, 4, 4, 4],
                       "NUM_CHANNELS": [48, 96, 192, 384]},
        }

    @nn.compact
    def __call__(self, x, valid_hw=None):
        cfg = self._cfg()
        n, h, w, _ = x.shape
        # Zero-pad bleed note: the reference ITSELF zero-pads HRNet input
        # to 32-multiples (HRNet.py:500-513) and lets the pad region run
        # through BN/convs, so padded buckets here match the reference's
        # own padding regime; per-conv valid-extent masking (see
        # resnet/vgg) is deliberately NOT applied. Only the input image
        # pad is re-zeroed.
        x = mask_valid_hw(x, valid_hw)
        # pad to multiples of 32 (reference HRNet.py:500-513)
        hp = (-h) % 32
        wp = (-w) % 32
        if hp or wp:
            x = jnp.pad(x, ((0, 0), (0, hp), (0, wp), (0, 0)))

        x = _conv_bn(x, 64, 3, 2, 1, self.dtype, "stem1")
        x = _conv_bn(x, 64, 3, 2, 1, self.dtype, "stem2")

        # layer1: bottlenecks at 64 -> 256
        s1 = cfg["STAGE1"]
        block_cls = _BLOCKS[s1["BLOCK"]]
        ch1 = s1["NUM_CHANNELS"][0]
        x = block_cls(ch1, downsample=True, dtype=self.dtype, name="layer1_b0")(x)
        for b in range(1, s1["NUM_BLOCKS"][0]):
            x = block_cls(ch1, dtype=self.dtype, name=f"layer1_b{b}")(x)
        pre_chans = [ch1 * block_cls.expansion]

        xs = [x]
        for stage_i in (2, 3, 4):
            sc = cfg[f"STAGE{stage_i}"]
            blk = _BLOCKS[sc["BLOCK"]]
            cur_chans = [c * blk.expansion for c in sc["NUM_CHANNELS"]]
            # transition (reference _make_transition_layer :419-451)
            new_xs = []
            for i in range(sc["NUM_BRANCHES"]):
                if i < len(pre_chans):
                    if cur_chans[i] != pre_chans[i]:
                        new_xs.append(
                            _conv_bn(
                                xs[i], cur_chans[i], 3, 1, 1, self.dtype,
                                f"trans{stage_i}_{i}",
                            )
                        )
                    else:
                        new_xs.append(xs[i])
                else:
                    t = xs[-1]
                    for j in range(i + 1 - len(pre_chans)):
                        out_ch = (
                            cur_chans[i]
                            if j == i - len(pre_chans)
                            else pre_chans[-1]
                        )
                        t = _conv_bn(
                            t, out_ch, 3, 2, 1, self.dtype,
                            f"trans{stage_i}_{i}_{j}",
                        )
                    new_xs.append(t)
            xs = new_xs
            inchannels = list(cur_chans)
            for m in range(sc["NUM_MODULES"]):
                xs = HRModule(
                    num_branches=sc["NUM_BRANCHES"],
                    block=sc["BLOCK"],
                    num_blocks=tuple(sc["NUM_BLOCKS"]),
                    num_inchannels=tuple(inchannels),
                    num_channels=tuple(sc["NUM_CHANNELS"]),
                    dtype=self.dtype,
                    name=f"stage{stage_i}_m{m}",
                )(xs)
                inchannels = cur_chans
            pre_chans = cur_chans

        # classification head (reference _make_head :368-417)
        head_channels = [32, 64, 128, 256]
        y = HRBottleneck(
            head_channels[0], downsample=True, dtype=self.dtype, name="incre0"
        )(xs[0])
        for i in range(len(pre_chans) - 1):
            inc = HRBottleneck(
                head_channels[i + 1], downsample=True, dtype=self.dtype,
                name=f"incre{i + 1}",
            )(xs[i + 1])
            ds = TorchConv(
                head_channels[i + 1] * 4, (3, 3), strides=(2, 2), padding=1,
                use_bias=True, dtype=self.dtype, name=f"downsamp{i}_conv",
            )(y)
            ds = FrozenBatchNorm(head_channels[i + 1] * 4, name=f"downsamp{i}_bn")(ds)
            ds = nn.relu(ds)
            y = inc + ds
        y = TorchConv(
            2048, (1, 1), use_bias=True, dtype=self.dtype, name="final_conv"
        )(y)
        y = FrozenBatchNorm(2048, name="final_bn")(y)
        return nn.relu(y)


def frozen_param_paths(freeze_at: int):
    """FREEZE_AT stages (reference HRNet.py _init_modules :331-343):
    stage1 == stem convs + layer1; stage k == stage{k} modules."""
    out = []
    for i in range(1, freeze_at + 1):
        if i == 1:
            out += ["stem1", "stem2", "layer1"]
        else:
            out.append(f"stage{i}")
    return out


def register():
    from cim_tpu.models.builder import register_backbone

    register_backbone("HRNet.get_HRNet", HRNetW48)


register()
