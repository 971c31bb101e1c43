"""Golden parity against the *executed* reference lib/nn extension modules.

The reference ships a small nn-extension package (imported as ``mynn`` by
lib/modeling/resnet50.py:10 and vgg16.py:10): AffineChannel2d
(lib/nn/modules/affine.py), GroupNorm with torch's UNBIASED variance
(lib/nn/modules/normalization.py + lib/nn/functional.py:4-19),
BilinearInterpolation2d — a frozen-bilinear ConvTranspose2d
(lib/nn/modules/upsample.py), and the Caffe2 XavierFill / MSRAFill
initializers (lib/nn/init.py:11-24). This module imports and EXECUTES
those exact files (with only a torch._six import shim) and pins
cim_tpu.models.layers against them:

- GroupNorm: exact forward parity (the unbiased ddof=1 variance — flax's
  nn.GroupNorm uses the biased estimator and measurably diverges at small
  spatial sizes, asserted below).
- AffineChannel2d / BilinearInterpolation2d: exact forward parity, incl.
  the transposed-conv padding arithmetic on odd spatial sizes.
- XavierFill/MSRAFill: distributional parity (scale + support shape —
  MSRAFill draws a FULL normal whose tails exceed 2 sigma, which flax's
  "truncated_normal" mode would clip).
"""
from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF_LIB = "/root/reference/lib"


@pytest.fixture(scope="module")
def ref_nn():
    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    stub("torch._six", string_classes=str, int_classes=int)
    had = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_LIB)
    try:
        refnn = importlib.import_module("nn")
        refinit = importlib.import_module("nn.init")
    finally:
        sys.path.remove(REF_LIB)
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return refnn, refinit


def _nchw_to_nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _nhwc_to_nchw(y):
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


@pytest.mark.parametrize("hw", [(5, 3), (1, 1), (7, 7)])
def test_group_norm_parity(ref_nn, hw):
    """Reference GroupNorm (unbiased variance) == cim_tpu GroupNorm."""
    refnn, _ = ref_nn
    from cim_tpu.models.layers import group_norm

    rng = np.random.RandomState(0)
    n, c, g = 2, 8, 4
    x = rng.randn(n, c, *hw).astype(np.float32)
    w = rng.rand(c).astype(np.float32) + 0.5
    b = rng.randn(c).astype(np.float32)

    ref = refnn.GroupNorm(g, c)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(w))
        ref.bias.copy_(torch.from_numpy(b))
        y_ref = ref(torch.from_numpy(x)).numpy()

    mod = group_norm(num_groups=g)
    params = {"params": {"scale": jnp.asarray(w), "bias": jnp.asarray(b)}}
    y = _nhwc_to_nchw(mod.apply(params, _nchw_to_nhwc(x)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


def test_group_norm_unbiased_variance_matters(ref_nn):
    """flax's biased-variance GroupNorm measurably diverges from the
    reference at small spatial extents — documents why layers.GroupNorm
    reimplements the normalization instead of wrapping nn.GroupNorm."""
    import flax.linen as fnn

    refnn, _ = ref_nn
    rng = np.random.RandomState(1)
    n, c, g, hw = 1, 8, 4, (2, 2)  # m = (c/g)*h*w = 8 elements per group
    x = rng.randn(n, c, *hw).astype(np.float32)

    ref = refnn.GroupNorm(g, c)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()

    flax_gn = fnn.GroupNorm(num_groups=g, epsilon=1e-5)
    params = flax_gn.init(jax.random.PRNGKey(0), _nchw_to_nhwc(x))
    y_flax = _nhwc_to_nchw(flax_gn.apply(params, _nchw_to_nhwc(x)))
    # biased vs unbiased variance: sqrt(m/(m-1)) ~ 6.9% scale difference
    assert np.abs(y_flax - y_ref).max() > 1e-2


def test_affine_channel_parity(ref_nn):
    refnn, _ = ref_nn
    from cim_tpu.models.layers import AffineChannel2d

    rng = np.random.RandomState(2)
    n, c, h, w_ = 2, 6, 4, 5
    x = rng.randn(n, c, h, w_).astype(np.float32)
    w = rng.rand(c).astype(np.float32)
    b = rng.randn(c).astype(np.float32)

    ref = refnn.AffineChannel2d(c)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(w))
        ref.bias.copy_(torch.from_numpy(b))
        y_ref = ref(torch.from_numpy(x)).numpy()

    mod = AffineChannel2d(features=c)
    params = {"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}
    y = _nhwc_to_nchw(mod.apply(params, _nchw_to_nhwc(x)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("up_scale", [2, 4])
@pytest.mark.parametrize("hw", [(4, 4), (5, 3)])
def test_bilinear_interpolation_parity(ref_nn, up_scale, hw):
    """Frozen-bilinear upsample: same output shape AND values as the
    reference's ConvTranspose2d(k=2s, stride=s, padding=s//2)."""
    refnn, _ = ref_nn
    from cim_tpu.models.layers import BilinearInterpolation2d

    rng = np.random.RandomState(3)
    c = 3
    x = rng.randn(2, c, *hw).astype(np.float32)

    ref = refnn.BilinearInterpolation2d(c, c, up_scale)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()

    mod = BilinearInterpolation2d(features=c, up_scale=up_scale)
    xj = _nchw_to_nhwc(x)
    params = mod.init(jax.random.PRNGKey(0), xj)
    y = _nhwc_to_nchw(mod.apply(params, xj))
    assert y.shape == y_ref.shape, (y.shape, y_ref.shape)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)


def test_xavier_fill_distribution(ref_nn):
    """XavierFill == fan-in uniform with bound sqrt(3/fan_in); pin both
    sides' scale + support against the executed initializer."""
    _, refinit = ref_nn
    from cim_tpu.models.layers import xavier_fill_init

    torch.manual_seed(0)
    o, i = 512, 256
    w_ref = refinit.XavierFill(torch.empty(o, i)).numpy()
    bound = np.sqrt(3.0 / i)
    assert np.abs(w_ref).max() <= bound + 1e-6
    assert w_ref.std() == pytest.approx(bound / np.sqrt(3), rel=0.02)

    w = np.asarray(xavier_fill_init()(jax.random.PRNGKey(0), (i, o)))
    assert np.abs(w).max() <= bound + 1e-6
    assert w.std() == pytest.approx(w_ref.std(), rel=0.02)
    # uniform, not normal: no sample near 2x std would exist for uniform
    assert np.abs(w).max() / w.std() < 1.8


def test_msra_fill_distribution(ref_nn):
    """MSRAFill == fan-out FULL normal N(0, 2/fan_out). For a conv weight
    (O,I,kh,kw) the reference's fan_out = numel/shape[1] = O*kh*kw — the
    same fan flax computes for an HWIO kernel. Pin scale parity AND the
    untruncated tails (flax's "truncated_normal" mode clips at 2 sigma,
    which layers.msra_fill_init deliberately avoids)."""
    _, refinit = ref_nn
    from cim_tpu.models.layers import msra_fill_init

    torch.manual_seed(0)
    o, i, k = 128, 64, 3
    w_ref = refinit.MSRAFill(torch.empty(o, i, k, k)).numpy()
    sigma = np.sqrt(2.0 / (o * k * k))
    assert w_ref.std() == pytest.approx(sigma, rel=0.02)

    w = np.asarray(msra_fill_init()(jax.random.PRNGKey(0), (k, k, i, o)))
    assert w.std() == pytest.approx(w_ref.std(), rel=0.02)
    # full-normal tails: with ~740k samples, max |w| ~ 4.7 sigma; a
    # 2-sigma-truncated draw could never exceed 2.01 sigma
    assert np.abs(w).max() / w.std() > 3.0
    assert np.abs(w_ref).max() / w_ref.std() > 3.0
