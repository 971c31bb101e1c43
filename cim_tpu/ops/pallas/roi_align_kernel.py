"""Pallas TPU RoIAlign kernel (Kronecker-weight matmul formulation).

Why not gathers: RoIAlign at production shape (N=4096 ROIs, 7x7 bins,
2x2 samples, 4 corners, C=1024) as XLA gathers materializes ~16 copies of
the (N, 7, 7, C) output (~13GB of HBM traffic; the top allocations of the
train step). Bilinear sample weights factorize per axis, so each ROI's
pooled output is a linear map of the feature map:

    out[(y, x), :] = M @ F,   M[(y, x), (h, w)] = Ay[y, h] * Ax[x, w]

with Ay/Ax the per-axis summed adaptive-grid bilinear weights (divided by
the sample counts). A block of BN ROIs stacks M into one
(BN*R^2, H*W) @ (H*W, C) MXU matmul; the backward is the transposed
matmul accumulated over ROI blocks (replacing the CUDA atomicAdd scatter
of the reference's kernel, lib/modeling/roi_xfrom/roi_align/src/
roi_align_kernel.cu). HBM traffic collapses to one read of F per
(ROI-block, C-block) plus the output itself.

Mosaic constraints shaped this design: ROI boxes arrive via scalar
prefetch (SMEM) and the weight matrix M is generated *elementwise* from
2-D iotas + scalars (y = i//R, x = i%R on sublanes; h = j//W, w = j%W on
lanes) — no >2-D elementwise ops, no sublane<->lane reshapes (the only
reshapes are leading-dim splits/merges, which mosaic supports). The
feature map is passed pre-flattened (H*W, C) from XLA.

Semantics: identical to cim_tpu.ops.roi_align (mmcv aligned=True,
sampling_ratio 0 => adaptive ceil(bin) capped at max_adaptive_grid) —
cross-checked in tests/test_pallas_roi_align.py.

Why not the separable two-stage (row-resample then column-resample)
variant, which needs ~7x fewer matmul FLOPs (R*H*W*C + R^2*W*C vs
R^2*H*W*C per ROI)? Stage 1 (contract h) maps to one shared MXU matmul
(Ay-stack @ F), but stage 2 contracts w per ROI over a (BN*R, W*bc)
intermediate whose contraction index is interleaved with channels in the
LANE dimension. On Mosaic that leaves three options, all worse than
Kronecker at these shapes: (a) express stage 2 as a matmul with
delta-expanded per-ROI weights — a bc-fold FLOP waste that cancels the
7x; (b) relayout the intermediate to (BN*R, W, bc) so the w-reduction
runs on sublanes — a row<->sublane relayout of the full intermediate per
grid step (~3 MB), costing more than the matmul it feeds; (c) loop
lane-slices on the VPU — R*W tiny vector ops per block, instruction-bound.
The Kronecker form keeps every FLOP on the MXU; its eval-shape overhead
was the per-ROI M build, addressed below (direct (R, H*W) weight
generation + one replication matmul each, and 48MB blocks so M is
rebuilt for 2 channel blocks instead of 8).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e VMEM is 128MB; the budget covers M scratch + F block + out block.
# The compiler's default scoped-vmem limit is 16MB, so every pallas_call
# here raises it to VMEM_LIMIT_BYTES (the budget plus pipelined in/out
# block copies and mosaic internal scratch). 48MB lets the eval-shape
# grid run 16-ROI blocks with 512-channel F blocks, cutting the
# per-channel-block M rebuild redundancy 4x vs the old 8MB budget (the M
# build, not the matmul, dominated eval-shape cost).
VMEM_BUDGET_BYTES = 48 * 1024 * 1024
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _sep_weight(bin_f, pos_f, lo, size, r, grid_cap, length, sampling_ratio):
    """Separable axis weight, elementwise over (bin, pos) index arrays.

    bin_f/pos_f: f32 arrays (same shape) of bin index in [0, r) and
    feature coordinate in [0, length); lo/size: scalars; length: the
    *valid* feature extent — a static int or a dynamic f32 scalar (SMEM)
    when the feature map is a zero-padded bucket. Returns the summed
    bilinear weight of the ROI's adaptive sample grid, divided by the
    per-axis sample count."""
    length = jnp.float32(length)
    bin_sz = size / r
    if sampling_ratio > 0:
        g = jnp.float32(sampling_ratio)
    else:
        g = jnp.clip(jnp.ceil(bin_sz), 1.0, float(grid_cap))
    inv_g = 1.0 / g
    start = lo + bin_f * bin_sz
    acc = jnp.zeros_like(bin_f)
    for s in range(grid_cap):
        coord = start + (s + 0.5) * bin_sz * inv_g
        ok = (coord >= -1.0) & (coord <= length) & (s < g)
        c = jnp.maximum(coord, 0.0)
        low = jnp.floor(c)
        at_edge = low >= length - 1
        low = jnp.minimum(low, length - 1.0)
        high = jnp.minimum(low + 1.0, length - 1.0)
        lw = jnp.where(at_edge, 0.0, c - low)
        hw = 1.0 - lw
        contrib = (pos_f == low) * hw + (pos_f == high) * lw
        acc = acc + jnp.where(ok, contrib, 0.0)
    return acc * inv_g


def _roi_scalars(rois_smem, idx, spatial_scale):
    x1 = rois_smem[idx * 4 + 0] * spatial_scale - 0.5
    y1 = rois_smem[idx * 4 + 1] * spatial_scale - 0.5
    x2 = rois_smem[idx * 4 + 2] * spatial_scale - 0.5
    y2 = rois_smem[idx * 4 + 3] * spatial_scale - 0.5
    return x1, y1, x2, y2


def _build_m(rois_smem, nb, block_n, m_ref, *, r, spatial_scale,
             sampling_ratio, grid_cap, height, width, bounds_off):
    """Fill m_ref (BN*R^2, H*W) with the stacked Kronecker weights.

    kron(Ay, Ax) is expanded with 0/1 replication matmuls instead of
    elementwise generation at full (R^2, H*W) size: the separable weights
    are generated elementwise at (R, H*W) directly (pos = lane//W for the
    y axis, lane%W for x — no (R^2, ...) VPU work), then each is
    row-replicated with one tiny MXU matmul per ROI:
      P1 = RepY @ Wy,  Wy[y, (h, w)] = Ay[y, h]
      P2 = RepX @ Wx,  Wx[x, (h, w)] = Ax[x, w]
      M  = P1 * P2
    (Half the matmul FLOPs of the earlier 4-matmul expansion; the M build
    — not the pooled matmul — dominated eval-shape cost.)
    """
    r2 = r * r
    hw = height * width
    # bin/pos index grids at (R, H*W): pos decodes the flattened lane
    bins = jax.lax.broadcasted_iota(jnp.int32, (r, hw), 0).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, hw), 1)
    hpos = (lane // width).astype(jnp.float32)
    wpos = (lane % width).astype(jnp.float32)
    # replication constants (0/1), built from iota compares
    i_r2 = jax.lax.broadcasted_iota(jnp.int32, (r2, r), 0)
    j_r = jax.lax.broadcasted_iota(jnp.int32, (r2, r), 1)
    rep_y = ((i_r2 // r) == j_r).astype(jnp.float32)  # RepY (R^2, R)
    rep_x = ((i_r2 % r) == j_r).astype(jnp.float32)  # RepX (R^2, R)

    # dynamic valid extent of a zero-padded bucket (trailing SMEM scalars)
    vh = rois_smem[bounds_off]
    vw = rois_smem[bounds_off + 1]
    for b in range(block_n):
        x1, y1, x2, y2 = _roi_scalars(rois_smem, nb * block_n + b,
                                      spatial_scale)
        wy = _sep_weight(bins, hpos, y1, y2 - y1, r, grid_cap, vh,
                         sampling_ratio)  # (R, H*W), constant over w
        wx = _sep_weight(bins, wpos, x1, x2 - x1, r, grid_cap, vw,
                         sampling_ratio)  # (R, H*W), constant over h
        p1 = jnp.dot(rep_y, wy, preferred_element_type=jnp.float32)
        p2 = jnp.dot(rep_x, wx, preferred_element_type=jnp.float32)
        m_ref[b * r2 : (b + 1) * r2, :] = p1 * p2


def _fwd_kernel(rois_smem, f3_ref, out_ref, m_s, *, r, spatial_scale,
                sampling_ratio, grid_cap, height, width, block_n,
                bounds_off):
    nb = pl.program_id(1)
    bc = f3_ref.shape[1]
    _build_m(rois_smem, nb, block_n, m_s, r=r, spatial_scale=spatial_scale,
             sampling_ratio=sampling_ratio, grid_cap=grid_cap,
             height=height, width=width, bounds_off=bounds_off)
    # matmul operand precision follows the feature dtype: bf16 features
    # (the model's compute dtype) get single-pass MXU; f32 keeps full
    # precision for parity tests
    out = jnp.dot(
        m_s[:].astype(f3_ref.dtype), f3_ref[:],
        preferred_element_type=jnp.float32,
    )  # (BN*R^2, BC)
    out_ref[:] = out.reshape(block_n, r, r, bc).astype(out_ref.dtype)


def _bwd_kernel(rois_smem, g_ref, df3_ref, m_s, *, r, spatial_scale,
                sampling_ratio, grid_cap, height, width, block_n,
                bounds_off):
    nb = pl.program_id(1)
    bc = g_ref.shape[3]
    r2 = r * r
    _build_m(rois_smem, nb, block_n, m_s, r=r, spatial_scale=spatial_scale,
             sampling_ratio=sampling_ratio, grid_cap=grid_cap,
             height=height, width=width, bounds_off=bounds_off)

    @pl.when(nb == 0)
    def _():
        df3_ref[:] = jnp.zeros_like(df3_ref)

    g2 = g_ref[:].reshape(block_n * r2, bc)
    dfb = jnp.dot(
        m_s[:].T.astype(g2.dtype), g2, preferred_element_type=jnp.float32
    )  # (H*W, BC)
    df3_ref[:] += dfb.astype(df3_ref.dtype)


def _pad_n(rois, block_n):
    n = rois.shape[0]
    n_pad = -n % block_n
    if n_pad:
        rois = jnp.concatenate(
            [rois, jnp.zeros((n_pad, 4), rois.dtype)], axis=0
        )
    return rois, n


def _pick_blocks(height, width, channels, r, block_n, block_c):
    """Shrink (block_n, block_c) until M + F + out fit the VMEM budget."""
    hw = height * width
    bc = min(block_c, channels)
    while channels % bc:
        bc //= 2
    bn = block_n
    while bn > 1 and (bn * r * r * hw + hw * bc + bn * r * r * bc) * 4 > (
        VMEM_BUDGET_BYTES
    ):
        bn //= 2
    while bc > 128 and (bn * r * r * hw + hw * bc + bn * r * r * bc) * 4 > (
        VMEM_BUDGET_BYTES
    ):
        bc //= 2
    return bn, max(bc, 1)


def roi_align_pallas(
    features,
    rois,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 0,
    max_adaptive_grid: int = 4,
    block_n: int = 16,
    block_c: int = 512,
    valid_hw=None,
):
    """Pallas RoIAlign: features (H, W, C) + rois (N, 4) -> (N, R, R, C).

    valid_hw: optional (h, w) true feature extent inside a zero-padded
    bucket (static or traced scalars); border snapping then follows the
    valid boundary. Rides to the kernel as two trailing SMEM scalars.
    """
    height, width = features.shape[:2]
    if valid_hw is None:
        valid_hw = (height, width)
    valid_arr = jnp.stack(
        [jnp.float32(valid_hw[0]), jnp.float32(valid_hw[1])]
    )
    return _roi_align_pallas_vjp(
        features, rois, valid_arr, output_size, spatial_scale,
        sampling_ratio, max_adaptive_grid, block_n, block_c,
    )


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8),
)
def _roi_align_pallas_vjp(
    features, rois, valid_arr, output_size, spatial_scale, sampling_ratio,
    max_adaptive_grid, block_n, block_c,
):
    return _forward(
        features, rois, valid_arr, output_size, spatial_scale,
        sampling_ratio, max_adaptive_grid, block_n, block_c,
    )


def _common(features, rois, r, block_n, block_c):
    height, width, channels = features.shape
    block_n, bc = _pick_blocks(height, width, channels, r, block_n, block_c)
    rois_p, n = _pad_n(jnp.asarray(rois, jnp.float32), block_n)
    f3 = features.reshape(height * width, channels)
    return height, width, channels, block_n, bc, rois_p, n, f3


def _forward(features, rois, valid_arr, r, spatial_scale, sampling_ratio,
             grid_cap, block_n, block_c):
    height, width, channels, block_n, bc, rois_p, n, f3 = _common(
        features, rois, r, block_n, block_c
    )
    n_pad = rois_p.shape[0]
    num_cb = channels // bc
    num_nb = n_pad // block_n

    kernel = functools.partial(
        _fwd_kernel, r=r, spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio, grid_cap=grid_cap,
        height=height, width=width, block_n=block_n,
        bounds_off=n_pad * 4,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_cb, num_nb),
        in_specs=[
            pl.BlockSpec((height * width, bc), lambda cb, nb, *_: (0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_n, r, r, bc), lambda cb, nb, *_: (nb, 0, 0, cb),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_n * r * r, height * width), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, r, r, channels), features.dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * r * r * height * width * channels,
            bytes_accessed=int(
                features.size * 4 * num_nb + n_pad * r * r * channels * 4
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
    )(jnp.concatenate([rois_p.reshape(-1), valid_arr]), f3)
    return out[:n]


def _fwd_rule(features, rois, valid_arr, r, spatial_scale, sampling_ratio,
              grid_cap, block_n, block_c):
    out = _forward(
        features, rois, valid_arr, r, spatial_scale, sampling_ratio,
        grid_cap, block_n, block_c,
    )
    return out, (features, rois, valid_arr)


def _bwd_rule(r, spatial_scale, sampling_ratio, grid_cap, block_n, block_c,
              res, g):
    features, rois, valid_arr = res
    height, width, channels, block_n, bc, rois_p, n, _ = _common(
        features, rois, r, block_n, block_c
    )
    n_pad = rois_p.shape[0]
    g_p = jnp.zeros((n_pad, r, r, channels), g.dtype).at[:n].set(g)
    num_cb = channels // bc
    num_nb = n_pad // block_n

    kernel = functools.partial(
        _bwd_kernel, r=r, spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio, grid_cap=grid_cap,
        height=height, width=width, block_n=block_n,
        bounds_off=n_pad * 4,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_cb, num_nb),
        in_specs=[
            pl.BlockSpec((block_n, r, r, bc), lambda cb, nb, *_: (nb, 0, 0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (height * width, bc), lambda cb, nb, *_: (0, cb),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_n * r * r, height * width), jnp.float32),
        ],
    )
    df3 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (height * width, channels), features.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
    )(jnp.concatenate([rois_p.reshape(-1), valid_arr]), g_p)
    return (
        df3.reshape(height, width, channels),
        jnp.zeros_like(rois),
        jnp.zeros_like(valid_arr),
    )


_roi_align_pallas_vjp.defvjp(_fwd_rule, _bwd_rule)
