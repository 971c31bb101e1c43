"""RoIAlign / RoIPool for TPU (pure XLA; Pallas kernel in cim_tpu.ops.pallas).

Semantics follow the active op of the reference — mmcv.ops.RoIAlign with
``aligned=True`` (re-exported at reference lib/ops/__init__.py:6 and invoked
from lib/modeling/model_builder.py:229-232 with resolution 7,
sampling_ratio 0); the legacy CUDA kernel
(lib/modeling/roi_xfrom/roi_align/src/roi_align_kernel.cu) defines the
bilinear-interpolation border behavior reproduced by ``_bilinear_weights``.

Differences from the CUDA kernels, by TPU design:

- features are channel-last ``(H, W, C)`` (TPU-native layout);
- ``sampling_ratio=0`` (adaptive: ``ceil(bin_size)`` samples per bin) has a
  data-dependent sample count per ROI. XLA needs static shapes, so the
  adaptive grid is capped at ``max_adaptive_grid`` samples per axis; the
  per-ROI *effective* grid (≤ cap) is selected dynamically and the average is
  taken over exactly the sampled points, which reproduces mmcv bit-for-bit
  whenever ``ceil(roi_size/out_size) <= cap``, and is an unbiased sub-sampled
  average beyond it.
- gradients w.r.t. features come from XLA's gather transpose (scatter-add),
  equivalent to the CUDA backward's atomicAdd loop.

All shapes are fixed: padded ROI rows simply compute garbage that callers
mask out (validity masks), which keeps the op jit/vmap/pjit friendly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_weights(y, x, height, width, row_stride=None):
    """mmcv/Caffe2 bilinear_interpolate index+weight computation.

    height/width bound the *valid* feature extent (static ints or traced
    scalars — a zero-padded bucket's true extent); ``row_stride`` is the
    storage width used for flat indexing (defaults to ``width``).

    Returns (idx_ll, idx_lh, idx_hl, idx_hh) flat indices into
    (H*row_stride) and (w1, w2, w3, w4) weights, zeroed for out-of-bounds
    samples.
    """
    if row_stride is None:
        row_stride = width
    out_of_range = (y < -1.0) | (y > height) | (x < -1.0) | (x > width)
    y = jnp.clip(y, 0.0)
    x = jnp.clip(x, 0.0)
    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)

    y_at_edge = y_low >= height - 1
    x_at_edge = x_low >= width - 1
    y_low = jnp.minimum(y_low, height - 1)
    x_low = jnp.minimum(x_low, width - 1)
    y_high = jnp.minimum(y_low + 1, height - 1)
    x_high = jnp.minimum(x_low + 1, width - 1)
    # At the top edge the CUDA kernel snaps y to y_low (ly = 0); same for x.
    ly = jnp.where(y_at_edge, 0.0, y - y_low.astype(y.dtype))
    lx = jnp.where(x_at_edge, 0.0, x - x_low.astype(x.dtype))
    hy = 1.0 - ly
    hx = 1.0 - lx

    w1 = hy * hx
    w2 = hy * lx
    w3 = ly * hx
    w4 = ly * lx
    zero = jnp.zeros_like(w1)
    w1, w2, w3, w4 = (
        jnp.where(out_of_range, zero, w)
        for w in (w1, w2, w3, w4)
    )
    idx_ll = y_low * row_stride + x_low
    idx_lh = y_low * row_stride + x_high
    idx_hl = y_high * row_stride + x_low
    idx_hh = y_high * row_stride + x_high
    return (idx_ll, idx_lh, idx_hl, idx_hh), (w1, w2, w3, w4)


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_size",
        "spatial_scale",
        "sampling_ratio",
        "aligned",
        "max_adaptive_grid",
    ),
)
def roi_align(
    features,
    rois,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 0,
    aligned: bool = True,
    max_adaptive_grid: int = 2,
    valid_hw=None,
):
    """RoIAlign.

    Args:
      features: (H, W, C) feature map.
      rois: (N, 4) xyxy boxes in input-image coordinates.
      output_size: pooled resolution R (reference cfg FAST_RCNN.ROI_XFORM_RESOLUTION).
      spatial_scale: feature stride reciprocal.
      sampling_ratio: samples per bin per axis; 0 = adaptive ceil(bin) capped
        at max_adaptive_grid (see module docstring).
      aligned: half-pixel offset (mmcv default True).
      valid_hw: optional (h, w) valid feature extent inside a zero-padded
        bucket (traced scalars OK); border clamping/snapping then follows
        the *valid* boundary, matching the reference's unpadded execution.

    Returns:
      (N, R, R, C) pooled features.
    """
    height, width, channels = features.shape
    vh, vw = (height, width) if valid_hw is None else valid_hw
    n = rois.shape[0]
    r = output_size
    # values accumulate in the feature dtype (bf16 halves the dominant
    # (N, R, R, C) intermediates); coordinates/weights stay f32 — bf16
    # coordinates would quantize to ~8px at 2000px image scales
    dtype = features.dtype
    rois = rois.astype(jnp.float32)
    feat_flat = features.reshape(height * width, channels)

    offset = 0.5 if aligned else 0.0
    roi_x1 = rois[:, 0] * spatial_scale - offset
    roi_y1 = rois[:, 1] * spatial_scale - offset
    roi_x2 = rois[:, 2] * spatial_scale - offset
    roi_y2 = rois[:, 3] * spatial_scale - offset
    roi_w = roi_x2 - roi_x1
    roi_h = roi_y2 - roi_y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_w = roi_w / r  # (N,)
    bin_h = roi_h / r

    if sampling_ratio > 0:
        grid = sampling_ratio
        gh = jnp.full((n,), grid, jnp.int32)
        gw = jnp.full((n,), grid, jnp.int32)
    else:
        grid = max_adaptive_grid
        gh = jnp.clip(jnp.ceil(bin_h).astype(jnp.int32), 1, grid)
        gw = jnp.clip(jnp.ceil(bin_w).astype(jnp.int32), 1, grid)

    cdtype = jnp.float32  # coordinate/weight dtype
    bins = jnp.arange(r, dtype=cdtype)  # (R,)
    # bin start coordinates: (N, R)
    ys0 = roi_y1[:, None] + bins[None, :] * bin_h[:, None]
    xs0 = roi_x1[:, None] + bins[None, :] * bin_w[:, None]

    count = (gh * gw).astype(cdtype)  # (N,), >= 1 by construction

    acc = jnp.zeros((n, r, r, channels), dtype=dtype)
    # Static loop over the (<= grid*grid) sample offsets; per-ROI masks select
    # the dynamically-chosen adaptive grid.
    for iy in range(grid):
        y_valid = iy < gh  # (N,)
        # sample y position: start + (iy + .5) * bin_h / gh    -> (N, R)
        y = ys0 + (iy + 0.5) * (bin_h / gh.astype(cdtype))[:, None]
        for ix in range(grid):
            x_valid = ix < gw
            x = xs0 + (ix + 0.5) * (bin_w / gw.astype(cdtype))[:, None]
            # broadcast to (N, R, R): y over rows, x over cols
            yy = jnp.broadcast_to(y[:, :, None], (n, r, r))
            xx = jnp.broadcast_to(x[:, None, :], (n, r, r))
            idxs, ws = _bilinear_weights(yy, xx, vh, vw, row_stride=width)
            sample_valid = (y_valid & x_valid)[:, None, None]
            val = jnp.zeros((n, r, r, channels), dtype=dtype)
            for idx, w in zip(idxs, ws):
                w = jnp.where(sample_valid, w, 0.0).astype(dtype)
                val = val + jnp.take(feat_flat, idx.reshape(-1), axis=0).reshape(
                    n, r, r, channels
                ) * w[..., None]
            acc = acc + val
    return acc / count[:, None, None, None].astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "max_bin_cells"),
)
def roi_pool(
    features,
    rois,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    max_bin_cells: int = 8,
    valid_hw=None,
):
    """RoIPool (max pooling over quantized bins).

    Reference semantics: the legacy CUDA kernel
    lib/model/roi_pooling/src/roi_pooling_kernel.cu (RoIPoolF path of
    model_builder.py:227-228; unused by shipped configs). Bins are integer
    cell ranges [floor(ph*bin):ceil((ph+1)*bin)) of the rounded ROI; the
    output is the max over cells. The per-bin cell count is data-dependent,
    so it is capped at ``max_bin_cells`` per axis (exact when bins are small).

    Args / returns like :func:`roi_align`.
    """
    height, width, channels = features.shape
    vh, vw = (height, width) if valid_hw is None else valid_hw
    n = rois.shape[0]
    r = output_size
    dtype = features.dtype
    feat_flat = features.reshape(height * width, channels)

    x1 = jnp.round(rois[:, 0] * spatial_scale)
    y1 = jnp.round(rois[:, 1] * spatial_scale)
    x2 = jnp.round(rois[:, 2] * spatial_scale)
    y2 = jnp.round(rois[:, 3] * spatial_scale)
    roi_w = jnp.maximum(x2 - x1 + 1.0, 1.0)
    roi_h = jnp.maximum(y2 - y1 + 1.0, 1.0)
    bin_w = roi_w / r
    bin_h = roi_h / r

    bins = jnp.arange(r, dtype=dtype)
    # hstart = floor(ph * bin_h) + y1 (clamped to [0, H])
    hstart = jnp.floor(bins[None, :] * bin_h[:, None]) + y1[:, None]  # (N, R)
    hend = jnp.ceil((bins[None, :] + 1.0) * bin_h[:, None]) + y1[:, None]
    wstart = jnp.floor(bins[None, :] * bin_w[:, None]) + x1[:, None]
    wend = jnp.ceil((bins[None, :] + 1.0) * bin_w[:, None]) + x1[:, None]
    hstart = jnp.clip(hstart, 0, vh)
    hend = jnp.clip(hend, 0, vh)
    wstart = jnp.clip(wstart, 0, vw)
    wend = jnp.clip(wend, 0, vw)

    neg = jnp.asarray(-jnp.inf, dtype)
    out = jnp.full((n, r, r, channels), neg, dtype=dtype)
    for cy in range(max_bin_cells):
        yc = hstart + cy  # (N, R)
        y_ok = yc < hend
        for cx in range(max_bin_cells):
            xc = wstart + cx
            x_ok = xc < wend
            yy = jnp.broadcast_to(yc[:, :, None], (n, r, r))
            xx = jnp.broadcast_to(xc[:, None, :], (n, r, r))
            ok = jnp.broadcast_to(y_ok[:, :, None], (n, r, r)) & jnp.broadcast_to(
                x_ok[:, None, :], (n, r, r)
            )
            yy = jnp.clip(yy, 0, height - 1).astype(jnp.int32)
            xx = jnp.clip(xx, 0, width - 1).astype(jnp.int32)
            idx = (yy * width + xx).reshape(-1)
            val = jnp.take(feat_flat, idx, axis=0).reshape(n, r, r, channels)
            val = jnp.where(ok[..., None], val, neg)
            out = jnp.maximum(out, val)
    # Empty bins produce 0 (matches the CUDA kernel's maxval init when
    # is_empty), and fully-clipped bins too.
    return jnp.where(jnp.isfinite(out), out, 0.0)
