"""Dynamic int8 inference kernels (opt-in, eval-only).

The measured eval bottleneck is the MaskFuse head's own FLOPs: the 3x3
2C->C conv runs at 0.983 bf16 MFU in isolation (README — kernel-roofline
bound), so the remaining lever is cheaper arithmetic. TPU v5e's MXU runs
int8 at 2x the bf16 rate (394 TOPS vs 197 TFLOPs); these kernels
quantize dynamically at run time — per-output-channel weight scales,
per-tensor (conv) / per-row (matmul) activation scales, symmetric
round-to-nearest int8, int32 accumulation — so NO calibration data or
converted checkpoint is needed and the same f32 param tree serves both
paths.

Eval-only by construction: jnp.round has zero gradient, so these must
never run under jax.grad (the Trainer always builds the f32/bf16 model;
only engine.test.Evaluator rebuilds with cfg.TPU.EVAL_INT8).

No reference counterpart (the reference evaluates in f32 CUDA); this is
a beyond-parity TPU optimization, default OFF, with deviation bounds
pinned by tests/test_int8_eval.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _weight_scales(w, reduce_axes):
    """Per-output-channel symmetric scales: max|w| / 127 over reduce_axes."""
    s = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True) / 127.0
    return jnp.maximum(s, 1e-12)


def _quant(x, scale):
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def int8_dense(x, kernel, bias=None):
    """x (..., K) @ kernel (K, F) with per-row activation scales and
    per-column weight scales; int8 x int8 -> int32 on the MXU."""
    xf = x.astype(jnp.float32)
    wf = kernel.astype(jnp.float32)
    sx = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12
    )
    sw = _weight_scales(wf, reduce_axes=(0,))  # (1, F)
    xq = _quant(xf, sx)
    wq = _quant(wf, sw)
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx * sw
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def int8_conv_nhwc(x, kernel, bias=None, padding=1):
    """NHWC conv with int8 operands: x (N, H, W, Cin), kernel HWIO.

    Per-SAMPLE activation scales (reduce over H, W, Cin -> (N, 1, 1, 1)):
    the conv never mixes the N axis, so per-sample scales ride it validly
    — per-pixel scales could not (receptive fields overlap). Per-sample
    (not per-tensor) matters for correctness of the padded-proposal
    contract: each ROI row's quantization is independent of every other
    row, so pad rows and the proposal bucket size cannot perturb valid
    rows' scores (engine/test.py's padded==unpadded invariant). Weights
    get per-output-channel scales; int32 accumulation via
    lax.conv_general_dilated(preferred_element_type=int32)."""
    xf = x.astype(jnp.float32)
    wf = kernel.astype(jnp.float32)
    sx = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0, 1e-12
    )
    sw = _weight_scales(wf, reduce_axes=(0, 1, 2))  # (1, 1, 1, Cout)
    xq = _quant(xf, sx)
    wq = _quant(wf, sw)
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (sx * sw.reshape(1, 1, 1, -1))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out
