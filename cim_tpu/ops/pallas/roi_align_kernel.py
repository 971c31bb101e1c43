"""Pallas TPU RoIAlign kernel (separable-matmul formulation).

Why not gathers: RoIAlign at production shape (N=4096 ROIs, 7x7 bins,
2x2 samples, 4 corners, C=1024) as XLA gathers materializes ~16 copies of
the (N, 7, 7, C) output (~13GB of HBM traffic; the top allocations of the
train step). The bilinear weight of a sample factorizes over y and x, so
each ROI's pooled output is exactly

    out[ph, pw, :] = (Ay[ph, :] / gh) @ F @ (Ax[pw, :] / gw)^T

with Ay (R, H) / Ax (R, W) holding the summed per-axis bilinear weights of
the adaptive sample grid. Stacking a block of ROIs turns stage 1 into one
MXU matmul (BN*R, H) @ (H, W*C); stage 2 is a small batched contraction.
HBM traffic collapses to one read of F per (ROI-block, C-block) and one
write of the output. The backward pass is the transposed pair of matmuls
accumulated over ROI blocks (replacing the CUDA atomicAdd scatter of the
reference's kernel, lib/modeling/roi_xfrom/roi_align/src/
roi_align_kernel.cu).

Semantics: identical to cim_tpu.ops.roi_align (mmcv aligned=True,
sampling_ratio 0 => adaptive ceil(bin) capped at max_adaptive_grid) —
see tests/test_pallas_roi_align.py for the cross-check.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_N = 8
DEFAULT_BLOCK_C = 256


def _axis_weights(lo, size, n_bins, grid_cap, length, sampling_ratio):
    """Per-ROI separable weights for one axis.

    lo: (BN,) roi start (already scaled/offset); size: (BN,) roi extent.
    Returns (BN, R, L) weights, already divided by the per-roi sample
    count g — so stage-1/2 matmuls need no further normalization.
    """
    bn = lo.shape[0]
    r = n_bins
    bin_sz = size / r  # (BN,)
    if sampling_ratio > 0:
        g = jnp.full((bn,), sampling_ratio, jnp.float32)
    else:
        g = jnp.clip(jnp.ceil(bin_sz), 1.0, float(grid_cap))
    inv_g = 1.0 / g

    # mosaic's tpu.iota is integer-only; cast after
    bins = jax.lax.broadcasted_iota(jnp.int32, (r, grid_cap), 0).astype(
        jnp.float32
    )  # (R, G)
    samples = jax.lax.broadcasted_iota(jnp.int32, (r, grid_cap), 1).astype(
        jnp.float32
    )
    # sample coordinate: lo + bin*bin_sz + (s+.5)*bin_sz/g   -> (BN, R, G)
    coord = (
        lo[:, None, None]
        + bins[None] * bin_sz[:, None, None]
        + (samples[None] + 0.5) * (bin_sz * inv_g)[:, None, None]
    )
    s_valid = samples[None] < g[:, None, None]  # (BN, R, G)
    in_range = (coord >= -1.0) & (coord <= float(length))
    ok = s_valid & in_range

    c = jnp.maximum(coord, 0.0)
    low = jnp.floor(c)
    at_edge = low >= length - 1
    low = jnp.minimum(low, length - 1.0)
    high = jnp.minimum(low + 1.0, length - 1.0)
    lw = jnp.where(at_edge, 0.0, c - low)
    hw = 1.0 - lw

    pos = jax.lax.broadcasted_iota(
        jnp.int32, (bn, r, grid_cap, length), 3
    ).astype(jnp.float32)  # (BN, R, G, L)
    contrib = (pos == low[..., None]) * hw[..., None] + (
        pos == high[..., None]
    ) * lw[..., None]
    contrib = jnp.where(ok[..., None], contrib, 0.0)
    # sum over samples, fold in the 1/g normalization
    return jnp.sum(contrib, axis=2) * inv_g[:, None, None]  # (BN, R, L)


def _fwd_kernel(rois_ref, feat_ref, out_ref, *, r, spatial_scale,
                sampling_ratio, grid_cap, height, width):
    nb = pl.program_id(1)
    bn = out_ref.shape[0]
    bc = feat_ref.shape[2]

    rois = rois_ref[pl.ds(nb * bn, bn), :]  # (BN, 4)
    x1 = rois[:, 0] * spatial_scale - 0.5
    y1 = rois[:, 1] * spatial_scale - 0.5
    x2 = rois[:, 2] * spatial_scale - 0.5
    y2 = rois[:, 3] * spatial_scale - 0.5

    ay = _axis_weights(y1, y2 - y1, r, grid_cap, height, sampling_ratio)
    ax = _axis_weights(x1, x2 - x1, r, grid_cap, width, sampling_ratio)

    f2 = feat_ref[:].astype(jnp.float32).reshape(height, width * bc)
    t = jnp.dot(
        ay.reshape(bn * r, height), f2, preferred_element_type=jnp.float32
    )  # (BN*R, W*BC)
    t = t.reshape(bn, r, width, bc)
    # out[b, y, x, c] = sum_w ax[b, x, w] * t[b, y, w, c]
    out = jax.lax.dot_general(
        ax,
        t.reshape(bn, r * width, bc).reshape(bn, r, width, bc).transpose(0, 2, 1, 3).reshape(bn, width, r * bc),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BN, R(x), R(y)*BC)
    out = out.reshape(bn, r, r, bc).transpose(0, 2, 1, 3)  # (BN, y, x, BC)
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(rois_ref, g_ref, dfeat_ref, *, r, spatial_scale,
                sampling_ratio, grid_cap, height, width):
    nb = pl.program_id(1)
    num_nb = pl.num_programs(1)
    bn = g_ref.shape[0]
    bc = g_ref.shape[3]

    rois = rois_ref[pl.ds(nb * bn, bn), :]
    x1 = rois[:, 0] * spatial_scale - 0.5
    y1 = rois[:, 1] * spatial_scale - 0.5
    x2 = rois[:, 2] * spatial_scale - 0.5
    y2 = rois[:, 3] * spatial_scale - 0.5
    ay = _axis_weights(y1, y2 - y1, r, grid_cap, height, sampling_ratio)
    ax = _axis_weights(x1, x2 - x1, r, grid_cap, width, sampling_ratio)

    g = g_ref[:].astype(jnp.float32)  # (BN, R, R, BC)
    # tmp[b, y, w, c] = sum_x ax[b, x, w] * g[b, y, x, c]
    tmp = jax.lax.dot_general(
        ax,
        g.transpose(0, 2, 1, 3).reshape(bn, r, r * bc),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BN, W, R(y)*BC)
    # dF[h, w, c] += sum_b sum_y ay[b, y, h] * tmp[b, w, y, c]
    tmp = tmp.reshape(bn, width, r, bc).transpose(0, 2, 1, 3)  # (BN,R,W,BC)
    df = jnp.dot(
        ay.reshape(bn * r, height).T,
        tmp.reshape(bn * r, width * bc),
        preferred_element_type=jnp.float32,
    ).reshape(height, width, bc)

    @pl.when(nb == 0)
    def _():
        dfeat_ref[:] = jnp.zeros_like(dfeat_ref)

    dfeat_ref[:] += df.astype(dfeat_ref.dtype)


def _pad_n(rois, block_n):
    n = rois.shape[0]
    n_pad = -n % block_n
    if n_pad:
        rois = jnp.concatenate(
            [rois, jnp.zeros((n_pad, 4), rois.dtype)], axis=0
        )
    return rois, n


def _pick_block_c(channels, block_c):
    bc = min(block_c, channels)
    while channels % bc:
        bc //= 2
    return max(bc, 1)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(2, 3, 4, 5, 6, 7),
)
def roi_align_pallas(
    features,
    rois,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 0,
    max_adaptive_grid: int = 4,
    block_n: int = DEFAULT_BLOCK_N,
    block_c: int = DEFAULT_BLOCK_C,
):
    """Pallas RoIAlign: features (H, W, C) + rois (N, 4) -> (N, R, R, C)."""
    return _forward(
        features, rois, output_size, spatial_scale, sampling_ratio,
        max_adaptive_grid, block_n, block_c,
    )


def _forward(features, rois, r, spatial_scale, sampling_ratio, grid_cap,
             block_n, block_c):
    height, width, channels = features.shape
    rois_p, n = _pad_n(jnp.asarray(rois, jnp.float32), block_n)
    n_pad = rois_p.shape[0]
    bc = _pick_block_c(channels, block_c)
    num_cb = channels // bc
    num_nb = n_pad // block_n

    kernel = functools.partial(
        _fwd_kernel, r=r, spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio, grid_cap=grid_cap,
        height=height, width=width,
    )
    out = pl.pallas_call(
        kernel,
        grid=(num_cb, num_nb),
        in_specs=[
            pl.BlockSpec((n_pad, 4), lambda cb, nb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((height, width, bc), lambda cb, nb: (0, 0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_n, r, r, bc), lambda cb, nb: (nb, 0, 0, cb),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, r, r, channels), features.dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * r * height * width * channels,
            bytes_accessed=int(
                features.size * 4 * num_nb + n_pad * r * r * channels * 4
            ),
            transcendentals=0,
        ),
    )(rois_p, features)
    return out[:n]


def _fwd_rule(features, rois, r, spatial_scale, sampling_ratio, grid_cap,
              block_n, block_c):
    out = _forward(
        features, rois, r, spatial_scale, sampling_ratio, grid_cap,
        block_n, block_c,
    )
    return out, (features, rois)


def _bwd_rule(r, spatial_scale, sampling_ratio, grid_cap, block_n, block_c,
              res, g):
    features, rois = res
    height, width, channels = features.shape
    rois_p, n = _pad_n(jnp.asarray(rois, jnp.float32), block_n)
    n_pad = rois_p.shape[0]
    g_p = jnp.zeros((n_pad, r, r, channels), g.dtype).at[:n].set(g)
    bc = _pick_block_c(channels, block_c)
    num_cb = channels // bc
    num_nb = n_pad // block_n

    kernel = functools.partial(
        _bwd_kernel, r=r, spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio, grid_cap=grid_cap,
        height=height, width=width,
    )
    dfeat = pl.pallas_call(
        kernel,
        grid=(num_cb, num_nb),
        in_specs=[
            pl.BlockSpec((n_pad, 4), lambda cb, nb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, r, r, bc), lambda cb, nb: (nb, 0, 0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (height, width, bc), lambda cb, nb: (0, 0, cb),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((height, width, channels), features.dtype),
    )(rois_p, g_p)
    return dfeat, jnp.zeros_like(rois)


roi_align_pallas.defvjp(_fwd_rule, _bwd_rule)
