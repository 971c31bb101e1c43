"""Golden parity against the *executed* reference PRM primitives.

/root/reference/lib/prm/prm_modules.py imports only torch, so the real
PeakStimulation autograd Function (:9-55) and pr_conv2d excitation
backprop (:104-140) run directly as the oracle for cim_tpu.prm.modules —
replacing the hand-built torch oracles in tests/test_prm.py as the root
of trust for the peak forward, the peak-routed gradient, and the
PreHook/PostHook conv backward. Layout bridges only: NCHW<->NHWC and
OIHW<->HWIO transposes.
"""
from __future__ import annotations

import importlib.util

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from cim_tpu.prm.modules import peak_stimulation, pr_conv

REF_PRM = "/root/reference/lib/prm/prm_modules.py"


@pytest.fixture(scope="module")
def ref_prm():
    spec = importlib.util.spec_from_file_location("_ref_prm", REF_PRM)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _torch_median_filter(t):
    """The reference's peak_filter callable (prm_model_gt.py _median_filter
    semantics): per-(batch, class) spatial median threshold."""
    b, c, h, w = t.shape
    return torch.median(t.view(b, c, -1), dim=2)[0].view(b, c, 1, 1)


@pytest.mark.parametrize("use_filter", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_peak_stimulation_forward_parity(ref_prm, seed, use_filter):
    rng = np.random.RandomState(seed)
    x = rng.randn(2, 5, 9, 11).astype(np.float32)  # NCHW
    xt = torch.from_numpy(x)
    peak_list, agg = ref_prm.peak_stimulation(
        xt, return_aggregation=True, win_size=3,
        peak_filter=_torch_median_filter if use_filter else None,
    )
    want_map = np.zeros(x.shape, bool)
    pl = peak_list.numpy()
    want_map[pl[:, 0], pl[:, 1], pl[:, 2], pl[:, 3]] = True

    crm = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # NHWC
    got_map, got_agg = peak_stimulation(crm, 3, use_filter)
    np.testing.assert_array_equal(
        np.transpose(np.asarray(got_map), (0, 3, 1, 2)), want_map
    )
    # aggregation: classes with zero peaks are nan in the reference
    # (0/0); ours clamps the denominator — compare where peaks exist
    has = want_map.reshape(2, 5, -1).any(-1)
    np.testing.assert_allclose(
        np.asarray(got_agg)[has], agg.numpy()[has], rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_peak_stimulation_backward_parity(ref_prm, seed):
    """The reference's deliberate non-mean backward (grad routed to peak
    positions WITHOUT the 1/num_peaks factor, prm_modules.py:46-51)."""
    rng = np.random.RandomState(10 + seed)
    x = rng.randn(1, 4, 8, 8).astype(np.float32)
    up = rng.randn(1, 4).astype(np.float32)  # upstream grad on aggregation

    xt = torch.from_numpy(x).requires_grad_(True)
    _, agg = ref_prm.peak_stimulation(
        xt, return_aggregation=True, win_size=3,
        peak_filter=_torch_median_filter,
    )
    # some classes can have zero peaks -> nan aggregation; mask them out
    mask = torch.isfinite(agg)
    (agg * torch.from_numpy(up))[mask].sum().backward()
    want = xt.grad.numpy()

    def loss(crm):
        m, a = peak_stimulation(crm, 3, True)
        return jnp.sum(
            jnp.where(jnp.asarray(mask.numpy()), a * jnp.asarray(up), 0.0)
        )

    crm = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    got = np.transpose(np.asarray(jax.grad(loss)(crm)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("stride,padding,dilation", [
    ((1, 1), (1, 1), (1, 1)),
    ((2, 2), (0, 0), (1, 1)),
    ((1, 1), (2, 2), (2, 2)),
])
@pytest.mark.parametrize("seed", [0, 1])
def test_pr_conv_backward_parity(ref_prm, seed, stride, padding, dilation):
    """pr_conv2d (prm_modules.py:133-140): forward is the plain conv;
    backward is PreHook/PostHook excitation backprop. The reference
    patches nn.Conv2d.forward with pr_conv2d bound as a method."""
    rng = np.random.RandomState(20 + seed)
    cin, cout, k = 3, 5, 3
    x = rng.randn(1, cin, 10, 12).astype(np.float32)
    w = rng.randn(cout, cin, k, k).astype(np.float32)
    b = rng.randn(cout).astype(np.float32)

    conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                     dilation=dilation)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
    xt = torch.from_numpy(x).requires_grad_(True)
    out = ref_prm.pr_conv2d(conv, xt)
    g = rng.randn(*out.shape).astype(np.float32)
    out.backward(torch.from_numpy(g))
    want_gx = xt.grad.numpy()
    want_out = out.detach().numpy()

    # jax side: NHWC / HWIO
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    wj = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    gj = jnp.asarray(np.transpose(g, (0, 2, 3, 1)))

    def f(xi):
        return pr_conv(xi, wj, jnp.asarray(b), stride, padding, dilation)

    out_j, vjp = jax.vjp(f, xj)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out_j), (0, 3, 1, 2)), want_out,
        rtol=1e-4, atol=1e-4,
    )
    (gx,) = vjp(gj)
    np.testing.assert_allclose(
        np.transpose(np.asarray(gx), (0, 3, 1, 2)), want_gx,
        rtol=1e-4, atol=1e-4,
    )
