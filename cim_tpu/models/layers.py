"""Shared model building blocks (flax.linen, NHWC, TPU-native).

FrozenBatchNorm reproduces the reference's permanently-eval BatchNorm
(lib/modeling/resnet50.py:63-77: running statistics never update, affine
weights keep training unless the whole stage is frozen). Mean/var live in a
separate "stats" collection so they are never touched by the optimizer;
gamma/beta live in "params" and are frozen per-stage via the optimizer mask
(cim_tpu/engine/optimizer.py), mirroring requires_grad=False +
param-group selection in the reference (tools/train.py:282-311).

torch_linear_init / torch_conv_init replicate pytorch's default
kaiming-uniform(a=sqrt(5)) initialization so training dynamics match the
reference heads (which rely on torch defaults).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_kaiming_uniform(fan_in: int):
    """U(-b, b) with b = sqrt(6 / fan_in) / sqrt(... ) — pytorch's
    kaiming_uniform_(a=sqrt(5)) reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    * sqrt(3)... concretely: gain = sqrt(2/(1+5)) = sqrt(1/3);
    bound = gain * sqrt(3/fan_in) = 1/sqrt(fan_in)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _Int8Dense(nn.Module):
    """Param-compatible stand-in for nn.Dense computing via the dynamic
    int8 matmul (ops.quant). Same param names/shapes/inits, so the same
    checkpoint serves both paths. Eval-only (round() has zero grad)."""

    features: int
    kernel_init: Any
    bias_init: Any
    out_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from cim_tpu.ops.quant import int8_dense

        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features)
        )
        bias = self.param("bias", self.bias_init, (self.features,))
        y = int8_dense(x, kernel, bias)
        return y.astype(self.out_dtype) if self.out_dtype is not None else y


class _Int8Conv(nn.Module):
    """Param-compatible stand-in for nn.Conv (NHWC, HWIO) via the dynamic
    int8 convolution (ops.quant). Eval-only."""

    features: int
    kernel_size: Any
    padding: int
    kernel_init: Any
    bias_init: Any
    out_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from cim_tpu.ops.quant import int8_conv_nhwc

        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features)
        )
        bias = self.param("bias", self.bias_init, (self.features,))
        y = int8_conv_nhwc(x, kernel, bias, padding=self.padding)
        return y.astype(self.out_dtype) if self.out_dtype is not None else y


class _Im2ColConv(nn.Module):
    """Param-compatible stand-in for nn.Conv (NHWC, HWIO) spelled as patch
    extraction + one GEMM, so forward AND both gradients lower to
    dot_generals.

    Why it exists: XLA:CPU's Eigen fast path covers only the canonical
    forward conv layout; the weight-gradient conv it emits for this op
    (dim_labels f01b_i01o->01bf) falls back to a naive scalar loop —
    measured 88 s/execution for the MaskFuse head conv at a tiny anchor
    shape, ~340x the forward pass. The GEMM spelling is the same math
    (identical params, bit-identical init) and is what TPU/GPU backends
    do internally (implicit-GEMM convolution), so it is a fair spelling
    for the same-silicon CPU anchor (tools/bench_train_cpu.py). Off by
    default: the XLA:TPU conv already runs on the MXU at full rate."""

    features: int
    kernel_size: Any
    padding: int
    kernel_init: Any
    bias_init: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, cin, self.features)
        )
        bias = self.param("bias", self.bias_init, (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        p = self.padding
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        oh = x.shape[1] + 2 * p - kh + 1
        ow = x.shape[2] + 2 * p - kw + 1
        # (i, j)-major, channel-minor patch layout == row-major reshape of
        # the HWIO kernel
        patches = jnp.concatenate(
            [xp[:, i:i + oh, j:j + ow, :] for i in range(kh) for j in range(kw)],
            axis=-1,
        )
        y = patches.reshape(-1, kh * kw * cin) @ kernel.reshape(-1, self.features)
        return y.reshape(x.shape[0], oh, ow, self.features) + bias


class TorchLinear(nn.Module):
    """nn.Dense with pytorch default init (weight and bias U(-1/√fan_in, ·)).

    ``dtype``: computation dtype (params stay float32; bfloat16 compute puts
    the matmul on the MXU at full rate). ``int8``: dynamic w8a8 matmul
    (eval-only, cfg.TPU.EVAL_INT8) — identical param tree."""

    features: int
    dtype: Any = None
    int8: bool = False

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        init = torch_kaiming_uniform(fan_in)
        if self.int8:
            return _Int8Dense(
                self.features, kernel_init=init, bias_init=init,
                out_dtype=self.dtype, name="dense",
            )(x)
        return nn.Dense(
            self.features, kernel_init=init, bias_init=init, dtype=self.dtype,
            name="dense",
        )(x)


class TorchConv(nn.Module):
    """nn.Conv (NHWC) with explicit symmetric padding and pytorch default init."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = None
    int8: bool = False  # dynamic w8a8 conv (eval-only, cfg.TPU.EVAL_INT8)
    im2col: bool = False  # GEMM spelling (CPU anchor; see _Im2ColConv)

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel_size[0] * self.kernel_size[1]
        init = torch_kaiming_uniform(fan_in)
        if self.int8:
            assert self.strides == (1, 1) and self.dilation == 1 and self.use_bias
            return _Int8Conv(
                self.features, self.kernel_size, padding=self.padding,
                kernel_init=init, bias_init=init, out_dtype=self.dtype,
                name="conv",
            )(x)
        if self.im2col:
            assert self.strides == (1, 1) and self.dilation == 1 and self.use_bias
            return _Im2ColConv(
                self.features, self.kernel_size, padding=self.padding,
                kernel_init=init, bias_init=init, dtype=self.dtype,
                name="conv",
            )(x)
        pad = ((self.padding, self.padding), (self.padding, self.padding))
        return nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=init,
            bias_init=init,
            dtype=self.dtype,
            name="conv",
        )(x)


class FrozenBatchNorm(nn.Module):
    """BatchNorm permanently in eval mode.

    y = gamma * (x - mean) / sqrt(var + eps) + beta with mean/var constant
    ("stats" collection) and gamma/beta trainable ("params").
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "stats", "mean", lambda: jnp.zeros((self.features,))
        ).value
        var = self.variable(
            "stats", "var", lambda: jnp.ones((self.features,))
        ).value
        inv = jax.lax.rsqrt(var + self.eps) * gamma
        off = beta - mean * inv
        return x * inv.astype(x.dtype) + off.astype(x.dtype)


class AffineChannel2d(nn.Module):
    """Per-channel affine y = x * weight + bias (reference
    lib/nn/modules/affine.py AffineChannel2d — detectron's frozen-BN
    replacement without stored statistics). NHWC."""

    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * w.astype(x.dtype) + b.astype(x.dtype)


class BilinearInterpolation2d(nn.Module):
    """Fixed (non-trainable) bilinear upsampling: N,H,W,C -> N,sH,sW,C.

    Reproduces the reference's ConvTranspose2d(kernel=2s, stride=s,
    padding=s//2) with frozen FCN bilinear weights
    (lib/nn/modules/upsample.py, which asserts even up_scale). torch's
    ConvTranspose2d(stride s, padding p) == a forward conv over the
    s-dilated input with (k-1-p) edge padding and the spatially-flipped,
    IO-swapped kernel — jax.lax.conv_transpose's explicit padding means
    something different, so the dilated forward conv is spelled out
    (exact parity: tests/test_reference_exec_nn.py)."""

    features: int
    up_scale: int = 2

    @nn.compact
    def __call__(self, x):
        assert self.up_scale % 2 == 0, "Scale should be even"
        k = self.up_scale * 2
        import numpy as np

        def bilinear_kernel(key, shape, dtype=jnp.float32):
            del key
            factor = (k + 1) // 2
            center = factor - 1 if k % 2 == 1 else factor - 0.5
            og = np.ogrid[:k, :k]
            filt = (1 - abs(og[0] - center) / factor) * (
                1 - abs(og[1] - center) / factor
            )
            w = np.zeros(shape, np.float32)
            for c in range(self.features):
                w[:, :, c, c] = filt
            return jnp.asarray(w, dtype)

        # param layout: HWIO of the *transposed* conv (torch (I,O,kh,kw)
        # -> (kh,kw,I,O)), so torch weight loaders map 1:1
        w = self.param("kernel", bilinear_kernel, (k, k, self.features, self.features))
        w = jnp.flip(jax.lax.stop_gradient(w), (0, 1)).swapaxes(2, 3)
        s, pad = self.up_scale, k - 1 - self.up_scale // 2
        return jax.lax.conv_general_dilated(
            x, w,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def xavier_fill_init():
    """Caffe2 XavierFill == fan-in uniform (reference lib/nn/init.py:11-16)."""
    return nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


def msra_fill_init():
    """Caffe2 MSRAFill == fan-out normal He init (reference lib/nn/init.py:19-24).

    The reference draws from a FULL normal N(0, 2/fan_out); flax's
    "truncated_normal" mode clips at 2 sigma (different tails), so use the
    untruncated "normal" mode for distributional parity
    (tests/test_reference_exec_nn.py)."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class GroupNorm(nn.Module):
    """GroupNorm matching the reference's own functional (NHWC).

    The reference (lib/nn/functional.py:4-19, used by
    lib/nn/modules/normalization.py GroupNorm) normalizes with torch's
    default UNBIASED variance (``x.var(-1)``, ddof=1) — unlike standard
    GN / flax nn.GroupNorm (biased). The difference is ~1/m relative
    (m = C/G*H*W elements per group) but visible at small spatial sizes;
    tests/test_reference_exec_nn.py pins exact parity against the
    executed reference module."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        assert c % self.num_groups == 0
        w = self.param("scale", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        xt = jnp.moveaxis(x, -1, 1)  # (N, C, *spatial), reference layout
        shape = xt.shape
        xg = xt.reshape(shape[0], self.num_groups, -1)
        mean = xg.mean(-1, keepdims=True)
        var = xg.var(-1, ddof=1, keepdims=True)
        xg = (xg - mean) / jnp.sqrt(var + self.epsilon)
        vs = (1, c) + (1,) * (len(shape) - 2)
        xt = xg.reshape(shape) * w.reshape(vs) + b.reshape(vs)
        return jnp.moveaxis(xt, 1, -1)


def group_norm(num_groups: int = 32, epsilon: float = 1e-5):
    """GroupNorm (reference lib/nn/modules/normalization.py via
    cfg.GROUP_NORM; reference-variance semantics, see GroupNorm)."""
    return GroupNorm(num_groups=num_groups, epsilon=epsilon)


def mask_valid_hw(x, valid_hw):
    """Zero all positions at or beyond the valid spatial extent.

    x: (..., H, W, C); valid_hw: None (no-op) or a pair of int scalars
    (static or traced) giving the valid height/width at x's resolution.

    Why: fixed-shape buckets zero-pad images, and a zero input is NOT a
    fixed point of conv-with-bias / BatchNorm (BN(0) = beta - mean*gamma/
    sigma != 0), so garbage grows in the pad region and bleeds one row per
    spatial conv into the valid region — silently perturbing scores of
    border proposals vs the reference's unpadded execution. Masking before
    every spatial (k>1) conv/pool makes the padded forward bit-equal to
    torch's implicit-zero-padding on the unpadded image.
    """
    if valid_hw is None:
        return x
    h, w = x.shape[-3], x.shape[-2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) < valid_hw[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) < valid_hw[1]
    return x * (rows & cols)[..., None].astype(x.dtype)


def ceil_div_hw(valid_hw, k: int):
    """Valid extent after a stride-k op with 'same'-style padding
    (conv k3 s2 p1, conv k7 s2 p3, maxpool k3 s2 p1): ceil(v / k)."""
    if valid_hw is None:
        return None
    return ((valid_hw[0] + k - 1) // k, (valid_hw[1] + k - 1) // k)


def floor_div_hw(valid_hw, k: int):
    """Valid extent after maxpool k2 s2 p0 (VGG): floor(v / k)."""
    if valid_hw is None:
        return None
    return (valid_hw[0] // k, valid_hw[1] // k)


def max_pool_torch(x, window: int, stride: int, padding: int):
    """torch-compatible max pooling (NHWC, explicit symmetric padding)."""
    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )
