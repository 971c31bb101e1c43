"""Golden parity against the *executed* reference LR/momentum machinery.

/root/reference/lib/utils/net.py (update_learning_rate incl. the
BIAS_DOUBLE_LR group handling, the SCALE_MOMENTUM_THRESHOLD gating, and
_CorrectMomentum's momentum-buffer rescale by new_lr/cur_lr,
net.py:47-90) drives a real torch.optim.SGD with the reference's
two-param-group layout (tools/train.py:282-311) through a warmup + step
decay schedule; the resulting parameter trajectory is the oracle for
cim_tpu.engine.optimizer.make_sgd stepping through the same
lr_schedule values and gradients.

tests/test_optimizer.py pins single-step torch-SGD semantics and a
hand-derived correction case; what THIS module adds is the executed
reference deciding for itself WHEN to correct (threshold/1e-7 gates)
and what the bias group does across a full schedule.
"""
from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cim_tpu.config import clone_cfg, get_default_cfg
from cim_tpu.engine.optimizer import build_masks, lr_schedule, make_sgd

REF_LIB = "/root/reference/lib"


@pytest.fixture(scope="module")
def ref_net():
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
        net = importlib.import_module("utils.net")
        cfg_mod = importlib.import_module("core.config")
    finally:
        sys.path.remove(REF_LIB)
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return net, cfg_mod


def _cfg():
    cfg = clone_cfg(get_default_cfg())
    cfg.SOLVER.TYPE = "SGD"
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.WEIGHT_DECAY = 0.01
    cfg.SOLVER.BIAS_DOUBLE_LR = True
    cfg.SOLVER.BIAS_WEIGHT_DECAY = False
    cfg.SOLVER.SCALE_MOMENTUM = True
    cfg.SOLVER.SCALE_MOMENTUM_THRESHOLD = 1.1
    cfg.SOLVER.LR_POLICY = "steps_with_decay"
    cfg.SOLVER.GAMMA = 0.1
    cfg.SOLVER.STEPS = [0, 7]  # decay x0.1 at step 7 (ratio 10 > 1.1)
    cfg.SOLVER.WARM_UP_ITERS = 5
    cfg.SOLVER.WARM_UP_FACTOR = 0.8  # ramp ratios ~1.05 < threshold
    cfg.SOLVER.WARM_UP_METHOD = "linear"
    return cfg


def test_sgd_schedule_parity_vs_executed_reference(ref_net):
    net, cfg_mod = ref_net
    cfg = _cfg()
    rcfg = cfg_mod.cfg
    rcfg.immutable(False)
    rcfg.SOLVER.TYPE = "SGD"
    rcfg.SOLVER.BIAS_DOUBLE_LR = True
    rcfg.SOLVER.SCALE_MOMENTUM = True
    rcfg.SOLVER.SCALE_MOMENTUM_THRESHOLD = 1.1
    rcfg.SOLVER.LOG_LR_CHANGE_THRESHOLD = 1.1

    rng = np.random.RandomState(3)
    w0 = rng.normal(0, 1, 5).astype(np.float32)
    b0 = rng.normal(0, 1, 3).astype(np.float32)
    n_steps = 10
    gw = rng.normal(0, 1, (n_steps, 5)).astype(np.float32)
    gb = rng.normal(0, 1, (n_steps, 3)).astype(np.float32)
    lrs = [float(lr_schedule(cfg, s)) for s in range(n_steps)]
    # the schedule must actually exercise both gates: sub-threshold warmup
    # ramps (no correction) and the decay jump (correction)
    assert lrs[1] / lrs[0] < 1.1 and lrs[7] / lrs[6] == pytest.approx(0.1)

    # ---- executed reference: torch SGD + utils.net.update_learning_rate
    tw = torch.tensor(w0.copy(), requires_grad=True)
    tb = torch.tensor(b0.copy(), requires_grad=True)
    opt = torch.optim.SGD(
        [
            {"params": [tw], "lr": lrs[0], "weight_decay": 0.01},
            {"params": [tb], "lr": lrs[0] * 2, "weight_decay": 0.0},
        ],
        momentum=0.9,
    )
    cur_lr = lrs[0]
    for s in range(n_steps):
        if lrs[s] != cur_lr:
            net.update_learning_rate(opt, cur_lr, lrs[s])
            cur_lr = lrs[s]
        opt.zero_grad()
        tw.grad = torch.tensor(gw[s])
        tb.grad = torch.tensor(gb[s])
        opt.step()

    # ---- ours: make_sgd through the same lrs/grads
    params = {"layer": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    trainable, bias = build_masks(params, [])
    init, update = make_sgd(cfg, trainable, bias)
    state = init(params)
    for s in range(n_steps):
        grads = {"layer": {"kernel": jnp.asarray(gw[s]),
                           "bias": jnp.asarray(gb[s])}}
        params, state = update(grads, state, params, lrs[s])

    np.testing.assert_allclose(
        np.asarray(params["layer"]["kernel"]), tw.detach().numpy(), rtol=1e-5,
        err_msg="non-bias trajectory diverged from the executed reference",
    )
    np.testing.assert_allclose(
        np.asarray(params["layer"]["bias"]), tb.detach().numpy(), rtol=1e-5,
        err_msg="bias (2xLR, no-decay) trajectory diverged",
    )
    # the executed reference must have rescaled the momentum buffers at
    # the decay (this is what distinguishes it from plain torch SGD)
    buf = opt.state[tw]["momentum_buffer"].numpy()
    v = np.asarray(state.momentum["layer"]["kernel"])
    np.testing.assert_allclose(v, buf, rtol=1e-5)
