"""Peak Response Mapping model (FC-ResNet50 + peak finding + peak backprop).

Behavior contracts:
- fc_resnet50 (reference lib/prm/prm_model.py:279-307): full resnet50 trunk
  (conv1..layer4, stride 32) + 1x1 conv classifier -> class response maps;
- PeakResponseMapping inference (reference lib/prm/prm_model_gt.py:216-290):
  CRMs upsampled x sub_pixel_locating_factor (8) with bilinear
  align_corners, 3x3 peak finding with median filter, then one input-
  gradient backprop per peak under the pr_conv2d excitation rule,
  restricted to ground-truth classes with a best-peak fallback.

TPU design: the per-peak backward passes of the reference (a python loop
of .backward calls, the hot loop of AGPL preprocessing) become ONE
jax.vjp of the patched forward, vmapped over a padded block of one-hot
cotangents — all peaks of an image in a single compiled call.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cim_tpu.models.layers import FrozenBatchNorm, max_pool_torch, torch_kaiming_uniform
from cim_tpu.prm.modules import find_peaks, pr_conv

MAX_PEAKS = 64


class PRConvLayer(nn.Module):
    """Conv whose backward follows the excitation rule (pr_conv)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    excitation: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        fan_in = x.shape[-1] * k * k
        init = torch_kaiming_uniform(fan_in)
        w = self.param("kernel", init, (k, k, x.shape[-1], self.features))
        b = self.param("bias", init, (self.features,)) if self.use_bias else None
        if self.excitation:
            bb = b if b is not None else jnp.zeros((self.features,), w.dtype)
            return pr_conv(
                x, w, bb, (self.stride, self.stride),
                (self.padding, self.padding), (1, 1),
            )
        import jax.lax as lax

        out = lax.conv_general_dilated(
            x, w, (self.stride, self.stride),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + b if b is not None else out


class PRBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    excitation: bool = True

    @nn.compact
    def __call__(self, x):
        e = self.excitation
        out = PRConvLayer(self.planes, 1, use_bias=False, excitation=e, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(out))
        out = PRConvLayer(
            self.planes, 3, stride=self.stride, padding=1, use_bias=False,
            excitation=e, name="conv2",
        )(out)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(out))
        out = PRConvLayer(self.planes * 4, 1, use_bias=False, excitation=e, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.downsample:
            sc = PRConvLayer(
                self.planes * 4, 1, stride=self.stride, use_bias=False,
                excitation=e, name="downsample_conv",
            )(x)
            sc = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class FCResNet50(nn.Module):
    """Full resnet50 trunk + 1x1 classifier -> (B, H/32, W/32, C) CRMs."""

    num_classes: int = 20
    excitation: bool = True  # pr_conv backward (inference/peak-backprop mode)

    @nn.compact
    def __call__(self, x):
        e = self.excitation
        x = PRConvLayer(64, 7, stride=2, padding=3, use_bias=False,
                        excitation=e, name="res1_conv")(x)
        x = nn.relu(FrozenBatchNorm(64, name="res1_bn")(x))
        x = max_pool_torch(x, 3, 2, 1)
        for stage, (planes, blocks, stride) in {
            "res2": (64, 3, 1),
            "res3": (128, 4, 2),
            "res4": (256, 6, 2),
            "res5": (512, 3, 2),
        }.items():
            x = PRBottleneck(
                planes, stride=stride, downsample=True, excitation=e,
                name=f"{stage}_block0",
            )(x)
            for b in range(1, blocks):
                x = PRBottleneck(planes, excitation=e, name=f"{stage}_block{b}")(x)
        x = PRConvLayer(self.num_classes, 1, excitation=e, name="classifier")(x)
        return x


class PeakOutputs(NamedTuple):
    aggregation: np.ndarray  # (C,) peak-aggregated class scores
    crm: np.ndarray  # (Hs, Ws, C) upsampled class response maps
    peaks: np.ndarray  # (MAX_PEAKS, 3) [y, x, class] valid-prefixed
    peak_scores: np.ndarray  # (MAX_PEAKS,)
    peak_response_maps: np.ndarray  # (MAX_PEAKS, H_in, W_in)
    num_peaks: int


def _upsample_align_corners(x, factor: int):
    """bilinear x factor with align_corners=True (torch F.upsample
    semantics used at prm_model_gt.py:227-229)."""
    b, h, w, c = x.shape
    oh, ow = h * factor, w * factor
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    bq = x[:, y0][:, :, x1]
    cq = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (
        a * (1 - wy) * (1 - wx)
        + bq * (1 - wy) * wx
        + cq * wy * (1 - wx)
        + d * wy * wx
    )


class PeakResponseMapper:
    """Host-facing PRM runner (the reference's model.inference() mode)."""

    def __init__(self, num_classes=20, sub_pixel_locating_factor=8,
                 win_size=3, peak_threshold=10.0):
        self.num_classes = num_classes
        self.factor = sub_pixel_locating_factor
        self.win_size = win_size
        self.peak_threshold = peak_threshold
        self.model = FCResNet50(num_classes=num_classes, excitation=True)
        self._jit_cache = {}

    def init(self, rng_key, image_hw=(448, 448)):
        x = jnp.zeros((1,) + tuple(image_hw) + (3,))
        return self.model.init(rng_key, x)

    # -------------------------------------------------------------- #
    def _forward_fns(self, variables, shape):
        if shape in self._jit_cache:
            return self._jit_cache[shape]

        def crm_fn(image):
            out = self.model.apply(variables, image[None])
            return _upsample_align_corners(out, self.factor)[0]  # (Hs,Ws,C)

        @jax.jit
        def peaks_fn(image):
            crm = crm_fn(image)
            pm = find_peaks(crm[None], self.win_size, True)[0]
            return crm, pm

        @jax.jit
        def prm_fn(image, cotangents):
            # one vjp, vmapped over peak cotangents: all peak response
            # maps in a single compiled call
            _, vjp = jax.vjp(crm_fn, image)
            def single(ct):
                (g,) = vjp(ct)
                g = jnp.sum(g, axis=-1)  # sum over RGB (reference sums ch 1)
                g = jnp.clip(g, 0.0)
                return g / jnp.maximum(jnp.sum(g), 1e-12)
            return jax.vmap(single)(cotangents)

        self._jit_cache[shape] = (peaks_fn, prm_fn)
        return self._jit_cache[shape]

    def inference_gt(self, variables, image, gt_classes) -> PeakOutputs:
        """reference prm_model_gt forward (:216-290): peaks of gt classes
        above peak_threshold; per class with no such peak, the best peak
        of that class (fallback); peak response map per selected peak."""
        image = jnp.asarray(image)
        peaks_fn, prm_fn = self._forward_fns(variables, image.shape)
        crm, peak_map = peaks_fn(image)
        crm_np = np.asarray(crm)
        pm_np = np.asarray(peak_map)

        sel = []  # (y, x, class, score)
        for cls in gt_classes:
            ys, xs = np.nonzero(pm_np[:, :, cls])
            if len(ys) == 0:
                continue
            vals = crm_np[ys, xs, cls]
            above = vals > self.peak_threshold
            if above.any():
                for y, x, v in zip(ys[above], xs[above], vals[above]):
                    sel.append((y, x, cls, v))
            else:  # best-peak fallback
                j = int(np.argmax(vals))
                sel.append((ys[j], xs[j], cls, vals[j]))
        sel = sel[:MAX_PEAKS]
        n_peaks = len(sel)

        hs, ws, c = crm_np.shape
        cots = np.zeros((MAX_PEAKS, hs, ws, c), np.float32)
        for i, (y, x, cls, _) in enumerate(sel):
            cots[i, y, x, cls] = 1.0
        prms = np.asarray(prm_fn(image, jnp.asarray(cots))) if n_peaks else (
            np.zeros((MAX_PEAKS,) + image.shape[:2], np.float32)
        )

        peaks = np.zeros((MAX_PEAKS, 3), np.int32)
        scores = np.zeros((MAX_PEAKS,), np.float32)
        for i, (y, x, cls, v) in enumerate(sel):
            peaks[i] = (y, x, cls)
            scores[i] = v

        agg = np.zeros(self.num_classes, np.float32)
        for cls in range(self.num_classes):
            m = pm_np[:, :, cls]
            if m.any():
                agg[cls] = crm_np[:, :, cls][m].mean()
        return PeakOutputs(agg, crm_np, peaks, scores, prms, n_peaks)
