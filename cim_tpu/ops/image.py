"""Device-side image ops for fused TTA (pure XLA).

The reference's TTA loop (lib/core/test.py:149-240) resizes/flips the
image on the host with cv2 for every one of the 10 passes and ships each
variant to the device. On TPU that is 10 host->device transfers + 10
dispatches per image, which dominates eval wall-clock. These ops move the
augmentation into the compiled program: the ORIGINAL image is shipped
once (uint8, zero-padded bucket) and every pass derives its input
on-device.

resize_bilinear_dynamic reproduces cv2.resize(INTER_LINEAR) semantics —
half-pixel source coordinates src = (dst + 0.5)/scale - 0.5, 2x2 taps,
edge clamping — with a DYNAMIC scale and a dynamic source valid extent
(traced scalars), onto a STATIC output canvas. The horizontal flip of the
reference's hflip passes (test.py:243-265, applied to the original before
resizing) is folded into the source x coordinate (mirror then resample
commutes with resampling on the mirrored grid).

Formulation: bilinear taps factor per axis, so the resize is two dense
matmuls out = Ry @ img @ Rx^T with Ry (out_h, H) / Rx (out_w, W) holding
the 2-tap row/column weights (built elementwise from iotas + the dynamic
scale — static shapes, dynamic content). The earlier 4x full-canvas
gather formulation ran at ~1 element/cycle on the TPU's vector gather
path: 57 ms for a 1280x1024 canvas, ~17 ms/pass averaged over the TTA
protocol and the single largest cost of fused eval. The matmul form is
~6 GFLOP at the same canvas (<0.5 ms) and numerically identical taps
(Precision.HIGHEST keeps f32 accumulation; see
tests/test_image_resize.py for the gather cross-check).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_weights(out_len, src_static, src_valid_f, ratio, flip=False):
    """(out_len, src_static) bilinear weight matrix along one axis.

    src_valid_f: dynamic f32 valid source extent (<= src_static);
    ratio: dynamic f32 src/out sampling ratio; flip mirrors the source
    coordinate about src_valid_f - 1. Rows for out positions beyond the
    valid output extent are harmless (masked by the caller's inside
    mask); taps never read past src_valid_f - 1 (cv2 border replicate).
    """
    o = jnp.arange(out_len, dtype=jnp.float32)
    s = (o + 0.5) * ratio - 0.5
    if flip:
        s = (src_valid_f - 1.0) - s
    s = jnp.clip(s, 0.0, src_valid_f - 1.0)
    t0 = jnp.floor(s)
    frac = s - t0
    t1 = jnp.minimum(t0 + 1.0, src_valid_f - 1.0)
    idx = jax.lax.broadcasted_iota(jnp.float32, (out_len, src_static), 1)
    return (idx == t0[:, None]) * (1.0 - frac)[:, None] + (
        idx == t1[:, None]
    ) * frac[:, None]


def resize_bilinear_dynamic(
    image,
    out_hw,
    scale,
    src_valid_hw,
    hflip: bool = False,
):
    """Resize `image` (H, W, C) by a dynamic `scale` onto a static
    (out_h, out_w) canvas.

    Args:
      image: (H, W, C) float array; content occupies src_valid_hw.
      out_hw: static (out_h, out_w) canvas size.
      scale: dynamic float scalar; the valid output extent is
        round(src_valid * scale) (cv2.resize rounds the output size).
      src_valid_hw: dynamic (h, w) true source extent.
      hflip: mirror the source horizontally (about the valid width).

    Returns:
      (out, (out_h_valid, out_w_valid)): the canvas with the resized
      content in [0:out_h_valid, 0:out_w_valid] and zeros elsewhere.
    """
    out_h, out_w = out_hw
    src_h = jnp.asarray(src_valid_hw[0], jnp.float32)
    src_w = jnp.asarray(src_valid_hw[1], jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    # cv2.resize(fx=s) output size = round(src * s)
    ovh = jnp.round(src_h * scale).astype(jnp.int32)
    ovw = jnp.round(src_w * scale).astype(jnp.int32)
    # cv2 maps dst -> src with the ACTUAL ratio src/out (not 1/fx)
    ratio_y = src_h / jnp.maximum(ovh.astype(jnp.float32), 1.0)
    ratio_x = src_w / jnp.maximum(ovw.astype(jnp.float32), 1.0)

    h, w, _ = image.shape
    ry = _axis_weights(out_h, h, src_h, ratio_y)  # (out_h, H)
    rx = _axis_weights(out_w, w, src_w, ratio_x, flip=hflip)  # (out_w, W)
    # f32 weight x f32 pixel products must stay f32 on the MXU: default
    # bf16 operand rounding shifts pixel values ~0.5/255 which flips the
    # downstream uint8-truncation bits of the ToTensor path
    hi = jax.lax.Precision.HIGHEST
    t = jnp.einsum("oh,hwc->owc", ry, image.astype(jnp.float32),
                   precision=hi)
    out = jnp.einsum("pw,owc->opc", rx, t, precision=hi)

    rows = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1)
    inside = (rows < ovh) & (cols < ovw)
    return out * inside[..., None].astype(out.dtype), (ovh, ovw)


def resize_bilinear_gather(
    image,
    out_hw,
    scale,
    src_valid_hw,
    hflip: bool = False,
):
    """Gather-formulation reference of resize_bilinear_dynamic (same
    semantics, 4 full-canvas takes). Kept for the numerical cross-check
    in tests/test_image_resize.py; ~100x slower on TPU — do not use in
    the eval path."""
    out_h, out_w = out_hw
    src_h = jnp.asarray(src_valid_hw[0], jnp.float32)
    src_w = jnp.asarray(src_valid_hw[1], jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    ovh = jnp.round(src_h * scale).astype(jnp.int32)
    ovw = jnp.round(src_w * scale).astype(jnp.int32)
    ratio_y = src_h / jnp.maximum(ovh.astype(jnp.float32), 1.0)
    ratio_x = src_w / jnp.maximum(ovw.astype(jnp.float32), 1.0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1)
    sy = (rows.astype(jnp.float32) + 0.5) * ratio_y - 0.5
    sx = (cols.astype(jnp.float32) + 0.5) * ratio_x - 0.5
    if hflip:
        sx = (src_w - 1.0) - sx

    sy = jnp.clip(sy, 0.0, src_h - 1.0)
    sx = jnp.clip(sx, 0.0, src_w - 1.0)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, src_valid_hw[0] - 1)
    x1i = jnp.minimum(x0i + 1, src_valid_hw[1] - 1)

    h, w, c = image.shape
    flat = image.reshape(h * w, c)

    def take(yy, xx):
        return jnp.take(flat, (yy * w + xx).reshape(-1), axis=0).reshape(
            out_h, out_w, c
        )

    v00 = take(y0i, x0i)
    v01 = take(y0i, x1i)
    v10 = take(y1i, x0i)
    v11 = take(y1i, x1i)
    wy = wy[..., None]
    wx = wx[..., None]
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    inside = (rows < ovh) & (cols < ovw)
    return out * inside[..., None].astype(out.dtype), (ovh, ovw)
