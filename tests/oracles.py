"""Numpy oracles replicating reference-kernel semantics for golden tests.

These transliterate the behavior contracts of the reference's native kernels
(legacy CUDA RoIAlign at lib/modeling/roi_xfrom/roi_align/src/
roi_align_kernel.cu + mmcv aligned semantics; cython_nms) into slow,
obviously-correct numpy. Test-only code: intentionally loopy.
"""
import math

import numpy as np


def bilinear_interpolate(feat, y, x):
    """feat: (H, W, C); mmcv/Caffe2 border semantics."""
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[2], feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(math.floor(y))
    x_low = int(math.floor(x))
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly = y - y_low
    lx = x - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx
    return (
        hy * hx * feat[y_low, x_low]
        + hy * lx * feat[y_low, x_high]
        + ly * hx * feat[y_high, x_low]
        + ly * lx * feat[y_high, x_high]
    )


def roi_align_oracle(
    feat, rois, output_size, spatial_scale, sampling_ratio, aligned, grid_cap=None
):
    """feat: (H, W, C); rois: (N, 4) xyxy in image coords -> (N, R, R, C)."""
    n = rois.shape[0]
    r = output_size
    c = feat.shape[2]
    out = np.zeros((n, r, r, c), np.float32)
    offset = 0.5 if aligned else 0.0
    for i in range(n):
        x1 = rois[i, 0] * spatial_scale - offset
        y1 = rois[i, 1] * spatial_scale - offset
        x2 = rois[i, 2] * spatial_scale - offset
        y2 = rois[i, 3] * spatial_scale - offset
        roi_w = x2 - x1
        roi_h = y2 - y1
        if not aligned:
            roi_w = max(roi_w, 1.0)
            roi_h = max(roi_h, 1.0)
        bin_w = roi_w / r
        bin_h = roi_h / r
        gh = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_h / r))
        gw = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_w / r))
        gh = max(gh, 1)
        gw = max(gw, 1)
        if grid_cap is not None:
            gh = min(gh, grid_cap)
            gw = min(gw, grid_cap)
        for ph in range(r):
            for pw in range(r):
                acc = np.zeros(c, np.float32)
                for iy in range(gh):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / gh
                    for ix in range(gw):
                        xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / gw
                        acc += bilinear_interpolate(feat, yy, xx)
                out[i, ph, pw] = acc / (gh * gw)
    return out
