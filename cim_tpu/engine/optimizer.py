"""SGD optimizer + LR schedule with the reference's exact semantics.

Reference contracts:
- param groups: bias vs non-bias split by name, bias gets 2x LR
  (SOLVER.BIAS_DOUBLE_LR) and no weight decay unless BIAS_WEIGHT_DECAY
  (tools/train.py:282-311). Any parameter whose leaf name is "bias"
  (including BN beta) lands in the bias group, as named_parameters does.
- torch SGD update: d = g + wd * p; v = mu * v + d; p -= lr * v.
- momentum correction: when LR changes by ratio > SCALE_MOMENTUM_THRESHOLD
  the momentum buffer is scaled by new_lr/old_lr
  (lib/utils/net.py:47-84 _CorrectMomentum) — i.e. at decay boundaries.
- frozen params (FREEZE_AT stages + whole conv body if FREEZE_CONV_BODY)
  receive zero updates (requires_grad=False in the reference).
- schedule: steps_with_decay with linear warmup
  (tools/train.py:389-416; SOLVER defaults lib/core/config.py:267-343).

Implemented as a pure function pair (init/update) over the flax param
pytree — jit/pjit-safe, state is a pytree of momenta plus the previous LR.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class SGDState(NamedTuple):
    momentum: Any
    prev_lr: jax.Array


class AdamState(NamedTuple):
    mu: Any
    nu: Any
    count: jax.Array
    prev_lr: jax.Array


def lr_schedule(cfg, step):
    """steps_with_decay + warmup. `step` may be traced."""
    base = cfg.SOLVER.BASE_LR
    step = jnp.asarray(step, jnp.float32)
    decays = jnp.zeros((), jnp.float32)
    for s in list(cfg.SOLVER.STEPS)[1:]:
        decays = decays + (step >= s).astype(jnp.float32)
    lr = base * cfg.SOLVER.GAMMA**decays

    warm = cfg.SOLVER.WARM_UP_ITERS
    if warm > 0:
        if cfg.SOLVER.WARM_UP_METHOD == "linear":
            alpha = step / warm
            factor = cfg.SOLVER.WARM_UP_FACTOR * (1.0 - alpha) + alpha
        elif cfg.SOLVER.WARM_UP_METHOD == "constant":
            factor = jnp.asarray(cfg.SOLVER.WARM_UP_FACTOR, jnp.float32)
        else:
            raise KeyError(
                f"Unknown SOLVER.WARM_UP_METHOD: {cfg.SOLVER.WARM_UP_METHOD}"
            )
        # reference warmup sets BASE_LR * factor (ignores decay, which can't
        # overlap warmup in practice)
        lr = jnp.where(step < warm, base * factor, lr)
    return lr


def _path_names(path):
    names = []
    for p in path:
        key = getattr(p, "key", None)
        names.append(str(key) if key is not None else str(p))
    return names


def build_masks(params, frozen_prefixes, freeze_conv_body: bool = False):
    """(trainable_mask, bias_mask) pytrees of bools.

    frozen_prefixes: prefixes under the top-level 'conv_body' module
    (reference FREEZE_AT semantics)."""

    def classify(path, leaf):
        names = _path_names(path)
        is_bias = names[-1] == "bias"
        frozen = False
        if names and names[0] == "conv_body":
            if freeze_conv_body:
                frozen = True
            elif len(names) > 1:
                frozen = any(names[1].startswith(p) for p in frozen_prefixes)
        return (not frozen), is_bias

    trainable = jax.tree_util.tree_map_with_path(
        lambda p, x: classify(p, x)[0], params
    )
    bias = jax.tree_util.tree_map_with_path(lambda p, x: classify(p, x)[1], params)
    return trainable, bias


def make_adam(cfg, trainable_mask, bias_mask, b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.Adam semantics (reference SOLVER.TYPE == 'Adam',
    tools/train.py:310-311): bias-corrected moments, per-group LR (bias
    2x when BIAS_DOUBLE_LR), L2 term added to the gradient like torch's
    weight_decay."""
    wd = cfg.SOLVER.WEIGHT_DECAY
    bias_wd = cfg.SOLVER.WEIGHT_DECAY if cfg.SOLVER.BIAS_WEIGHT_DECAY else 0.0
    bias_mult = 2.0 if cfg.SOLVER.BIAS_DOUBLE_LR else 1.0

    def init(params):
        return AdamState(
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
            count=jnp.zeros((), jnp.int32),
            prev_lr=jnp.zeros((), jnp.float32),
        )

    def update(grads, state: AdamState, params, lr):
        lr = jnp.asarray(lr, jnp.float32)
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def new_moments(g, mu, nu, p, is_bias):
            decay = bias_wd if is_bias else wd
            d = g + decay * p
            return b1 * mu + (1 - b1) * d, b2 * nu + (1 - b2) * d * d

        moments = jax.tree.map(
            new_moments, grads, state.mu, state.nu, params, bias_mask
        )
        mu = jax.tree.map(lambda t: t[0], moments, is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree.map(lambda t: t[1], moments, is_leaf=lambda x: isinstance(x, tuple))

        def new_p(p, m, v, train, is_bias):
            step_lr = lr * (bias_mult if is_bias else 1.0)
            upd = (m / c1) / (jnp.sqrt(v / c2) + eps)
            return jnp.where(train, p - step_lr * upd, p)

        new_params = jax.tree.map(
            new_p, params, mu, nu, trainable_mask, bias_mask
        )
        return new_params, AdamState(mu=mu, nu=nu, count=count, prev_lr=lr)

    return init, update


def make_optimizer(cfg, trainable_mask, bias_mask):
    """SOLVER.TYPE dispatch (reference tools/train.py:308-311)."""
    if cfg.SOLVER.TYPE == "SGD":
        return make_sgd(cfg, trainable_mask, bias_mask)
    if cfg.SOLVER.TYPE == "Adam":
        return make_adam(cfg, trainable_mask, bias_mask)
    raise ValueError(f"Unknown SOLVER.TYPE: {cfg.SOLVER.TYPE}")


def make_sgd(cfg, trainable_mask, bias_mask):
    momentum = cfg.SOLVER.MOMENTUM
    wd = cfg.SOLVER.WEIGHT_DECAY
    bias_wd = cfg.SOLVER.WEIGHT_DECAY if cfg.SOLVER.BIAS_WEIGHT_DECAY else 0.0
    bias_mult = 2.0 if cfg.SOLVER.BIAS_DOUBLE_LR else 1.0
    scale_momentum = cfg.SOLVER.SCALE_MOMENTUM
    scale_thr = cfg.SOLVER.SCALE_MOMENTUM_THRESHOLD

    def init(params):
        return SGDState(
            momentum=jax.tree.map(jnp.zeros_like, params),
            prev_lr=jnp.zeros((), jnp.float32),
        )

    def update(grads, state: SGDState, params, lr):
        lr = jnp.asarray(lr, jnp.float32)
        prev = state.prev_lr
        eps = 1e-10
        ratio = jnp.maximum(
            lr / jnp.maximum(prev, eps), prev / jnp.maximum(lr, eps)
        )
        if scale_momentum:
            do_corr = jnp.logical_and(prev > 1e-7, ratio > scale_thr)
            corr = jnp.where(do_corr, lr / jnp.maximum(prev, eps), 1.0)
        else:
            corr = jnp.ones((), jnp.float32)

        def new_v(g, v, p, train, is_bias):
            decay = bias_wd if is_bias else wd
            v_next = momentum * (v * corr) + (g + decay * p)
            return jnp.where(train, v_next, v)

        def new_p(p, v, train, is_bias):
            step_lr = lr * (bias_mult if is_bias else 1.0)
            return jnp.where(train, p - step_lr * v, p)

        v_new = jax.tree.map(
            new_v, grads, state.momentum, params, trainable_mask, bias_mask
        )
        new_params = jax.tree.map(new_p, params, v_new, trainable_mask, bias_mask)
        return new_params, SGDState(momentum=v_new, prev_lr=lr)

    return init, update
