import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cim_tpu.prm.modules import find_peaks, median_peak_filter, peak_stimulation, pr_conv


def test_find_peaks_simple():
    x = np.zeros((1, 8, 8, 1), np.float32)
    x[0, 2, 3, 0] = 5.0
    x[0, 6, 6, 0] = 3.0
    pm = np.asarray(find_peaks(jnp.asarray(x), 3, use_median_filter=True))
    ys, xs, _ = np.nonzero(pm[0])
    got = set(zip(ys.tolist(), xs.tolist()))
    assert (2, 3) in got and (6, 6) in got
    # neighbors of the peak are not peaks
    assert (2, 4) not in got


def test_median_filter_suppresses_low_peaks(rng):
    x = rng.rand(1, 10, 10, 2).astype(np.float32)
    pm = np.asarray(find_peaks(jnp.asarray(x), 3, True))
    med = np.median(x.reshape(1, 100, 2), axis=1)
    ys, xs, cs = np.nonzero(pm[0])
    for y, xx, c in zip(ys, xs, cs):
        assert x[0, y, xx, c] >= med[0, c]


def test_peak_stimulation_backward_routes_to_peaks():
    x = np.zeros((1, 8, 8, 1), np.float32)
    x[0, 2, 3, 0] = 5.0
    x[0, 6, 6, 0] = 3.0

    def agg_sum(inp):
        _, agg = peak_stimulation(inp, 3, True)
        return jnp.sum(agg)

    g = np.asarray(jax.grad(agg_sum)(jnp.asarray(x)))
    # gradient is 1 at each peak (reference backward: peak_map * grad), 0 off
    assert g[0, 2, 3, 0] == 1.0
    assert g[0, 6, 6, 0] == 1.0
    assert np.abs(g).sum() == 2.0


def _torch_pr_conv_grad(x, w, b, gout, stride, padding):
    """Oracle for pr_conv backward using torch and the reference's
    PreHook/PostHook/pr_conv2d composition."""
    import torch
    import torch.nn.functional as F

    xt = torch.tensor(x.transpose(0, 3, 1, 2), requires_grad=True)  # NCHW
    wt = torch.tensor(w.transpose(3, 2, 0, 1))  # OIHW
    bt = torch.tensor(b)

    class PreHook(torch.autograd.Function):
        @staticmethod
        def forward(ctx, input, offset):
            ctx.save_for_backward(input, offset)
            return input.clone()

        @staticmethod
        def backward(ctx, grad_output):
            input, offset = ctx.saved_tensors
            return (input - offset) * grad_output, None

    class PostHook(torch.autograd.Function):
        @staticmethod
        def forward(ctx, input, norm_factor):
            ctx.save_for_backward(norm_factor)
            return input.clone()

        @staticmethod
        def backward(ctx, grad_output):
            (norm_factor,) = ctx.saved_tensors
            eps = 1e-10
            zero_mask = norm_factor < eps
            grad_input = grad_output / (torch.abs(norm_factor) + eps)
            grad_input[zero_mask.detach()] = 0
            return None, grad_input

    offset = xt.min().detach()
    inp = PreHook.apply(xt, offset)
    resp = F.conv2d(inp, wt, bt, stride, padding).detach()
    pos_w = F.relu(wt).detach()
    norm = F.conv2d(inp - offset, pos_w, None, stride, padding)
    out = PostHook.apply(resp, norm)
    out.backward(torch.tensor(gout.transpose(0, 3, 1, 2)))
    return xt.grad.numpy().transpose(0, 2, 3, 1)


def test_pr_conv_backward_matches_reference(rng):
    x = rng.randn(1, 9, 9, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 6).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    gout = rng.rand(1, 9, 9, 6).astype(np.float32)

    def f(inp):
        return jnp.sum(pr_conv(inp, jnp.asarray(w), jnp.asarray(b),
                               (1, 1), (1, 1), (1, 1)) * jnp.asarray(gout))

    got = np.asarray(jax.grad(f)(jnp.asarray(x)))
    want = _torch_pr_conv_grad(x, w, b, gout, 1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_prm_inference_gt_end_to_end(rng):
    """Tiny-image end-to-end PRM run: peaks found for gt classes with
    best-peak fallback; peak response maps normalized and non-negative."""
    from cim_tpu.prm.model import PeakResponseMapper

    mapper = PeakResponseMapper(num_classes=5, sub_pixel_locating_factor=2,
                                peak_threshold=10.0)
    variables = mapper.init(jax.random.PRNGKey(0), image_hw=(64, 64))
    image = rng.rand(64, 64, 3).astype(np.float32)
    out = mapper.inference_gt(variables, image, gt_classes=[1, 3])
    # fallback guarantees at least one peak per present class (unless a
    # class has no peak at all, which the median filter makes unlikely)
    assert out.num_peaks >= 1
    cls_found = set(out.peaks[: out.num_peaks, 2].tolist())
    assert cls_found.issubset({1, 3})
    prm = out.peak_response_maps[: out.num_peaks]
    assert (prm >= 0).all()
    sums = prm.reshape(out.num_peaks, -1).sum(-1)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-3)
