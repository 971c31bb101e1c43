"""Peak Response Mapping primitives (CVPR'18) in JAX.

Behavior contracts: reference lib/prm/prm_modules.py —
- peak_stimulation (:9-55): local maxima via 3x3 max-pool equality with
  -inf border padding, optional median filter threshold; the aggregation
  (mean of CRM over peaks per class) has a custom backward that routes the
  gradient only to peak locations;
- pr_conv2d (:133-140) + PreHook/PostHook (:104-131): excitation-style
  probabilistic peak backpropagation for conv layers, implemented here as
  a jax.custom_vjp conv.

Layout: NHWC (class response maps (B, H, W, C)).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def median_peak_filter(x):
    """Per-(batch, class) spatial median threshold
    (reference _median_filter, prm_model_gt.py:80-83). x: (B, H, W, C)."""
    b, h, w, c = x.shape
    return jnp.median(x.reshape(b, h * w, c), axis=1)[:, None, None, :]


def find_peaks(crm, win_size: int = 3, use_median_filter: bool = True):
    """Peak mask (B, H, W, C) bool.

    Matches the reference's max_pool2d(return_indices) == element_map
    test exactly: a position is a peak iff it is the *first (row-major)*
    maximal element of its own window — i.e. strictly greater than every
    window element preceding it and >= every element following it. (A
    plain x == maxpool(x) would mark whole plateaus as peaks; the
    reference marks none of a plateau's interior.)
    """
    assert win_size % 2 == 1
    pad = (win_size - 1) // 2
    neg = jnp.asarray(-jnp.inf, crm.dtype)

    def shifted(dy, dx):
        # value of the (dy, dx) window neighbor at each center, -inf
        # outside the image (the reference pads with -inf)
        return jnp.pad(
            crm,
            ((0, 0), (max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0)), (0, 0)),
            constant_values=neg,
        )[
            :,
            max(-dy, 0) : crm.shape[1] + max(-dy, 0),
            max(-dx, 0) : crm.shape[2] + max(-dx, 0),
            :,
        ]

    pre_max = jnp.full_like(crm, neg)
    post_max = jnp.full_like(crm, neg)
    for dy in range(-pad, pad + 1):
        for dx in range(-pad, pad + 1):
            if dy == 0 and dx == 0:
                continue
            nb = shifted(dy, dx)
            if dy < 0 or (dy == 0 and dx < 0):
                pre_max = jnp.maximum(pre_max, nb)
            else:
                post_max = jnp.maximum(post_max, nb)
    peak_map = (crm > pre_max) & (crm >= post_max)
    if use_median_filter:
        peak_map = peak_map & (crm >= median_peak_filter(crm))
    return peak_map


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def peak_stimulation(crm, win_size: int = 3, use_median_filter: bool = True):
    """(peak_map, aggregation): aggregation (B, C) = mean CRM over peaks.

    Custom VJP (reference PeakStimulation.backward :46-51): the gradient
    w.r.t. the CRM is grad_aggregation broadcast onto peak positions
    (deliberately NOT the true mean gradient — no 1/num_peaks factor).
    """
    peak_map = find_peaks(crm, win_size, use_median_filter)
    pm = peak_map.astype(crm.dtype)
    agg = jnp.sum(crm * pm, axis=(1, 2)) / jnp.maximum(
        jnp.sum(pm, axis=(1, 2)), 1e-12
    )
    return peak_map, agg


def _peak_fwd(crm, win_size, use_median_filter):
    out = peak_stimulation(crm, win_size, use_median_filter)
    return out, out[0].astype(crm.dtype)


def _peak_bwd(win_size, use_median_filter, peak_map, g):
    _, g_agg = g
    grad = peak_map * g_agg[:, None, None, :]
    return (grad,)


peak_stimulation.defvjp(_peak_fwd, _peak_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def pr_conv(x, w, b, strides=(1, 1), padding=(0, 0), dilation=(1, 1)):
    """Conv with excitation-backprop gradient (reference pr_conv2d).

    Forward: ordinary conv. Backward w.r.t. x:
      g_norm = g / (|norm| + eps), zeroed where norm < eps,
      with norm = conv(x - min(x), relu(w));
      grad_x = (x - min(x)) * conv_transpose(g_norm, relu(w)).
    No gradients flow to w/b (the reference detaches them).
    x: (B, H, W, Cin); w: (kh, kw, Cin, Cout) HWIO.
    """
    return _conv(x, w, b, strides, padding, dilation)


def _conv(x, w, b, strides, padding, dilation):
    pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b
    return out


def _pr_fwd(x, w, b, strides, padding, dilation):
    out = _conv(x, w, b, strides, padding, dilation)
    return out, (x, w)


def _pr_bwd(strides, padding, dilation, res, g):
    x, w = res
    eps = 1e-10
    offset = jnp.min(x)
    shifted = x - offset
    pos_w = jax.nn.relu(w)
    norm = _conv(shifted, pos_w, None, strides, padding, dilation)
    g_norm = g / (jnp.abs(norm) + eps)
    g_norm = jnp.where(norm < eps, 0.0, g_norm)

    # conv_transpose of g_norm with pos_w == grad of conv wrt input
    _, vjp = jax.vjp(
        lambda inp: _conv(inp, pos_w, None, strides, padding, dilation),
        shifted,
    )
    (gi,) = vjp(g_norm)
    grad_x = shifted * gi
    # the reference detaches weights/bias in the patched conv: zero grads
    return grad_x, jnp.zeros_like(w), jnp.zeros(w.shape[-1], w.dtype)


pr_conv.defvjp(_pr_fwd, _pr_bwd)


@jax.custom_vjp
def eb_linear(x, w, b):
    """Linear layer with excitation backprop: the pr_conv probabilistic
    rule applied to a dense layer. x: (..., Din); w: (Din, Dout).

    The reference's closest counterpart, lib/bp/exbp.py EBLinear
    (:51-86), is DEAD CODE upstream (nothing imports lib/bp) and differs
    in detail: it normalizes by |x@w+| without a small-norm zero mask,
    subtracts the input min only when negative, omits the
    (x - min)*grad input factor (it has no PreHook), and gates on a
    global torch.use_pos_weights flag. This implementation instead stays
    consistent with the ACTIVE pr_conv2d rule (prm_modules.py:104-140)
    so dense layers compose with the patched convs in one coherent
    excitation chain."""
    return x @ w + b


def _eb_fwd(x, w, b):
    return x @ w + b, (x, w)


def _eb_bwd(res, g):
    x, w = res
    eps = 1e-10
    offset = jnp.min(x)
    shifted = x - offset
    pos_w = jax.nn.relu(w)
    norm = shifted @ pos_w
    g_norm = g / (jnp.abs(norm) + eps)
    g_norm = jnp.where(norm < eps, 0.0, g_norm)
    grad_x = shifted * (g_norm @ pos_w.T)
    return grad_x, jnp.zeros_like(w), jnp.zeros(w.shape[-1], w.dtype)


eb_linear.defvjp(_eb_fwd, _eb_bwd)
