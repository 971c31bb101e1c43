import numpy as np
import jax
import jax.numpy as jnp

from cim_tpu.config import get_default_cfg
from cim_tpu.engine.optimizer import build_masks, make_sgd


def _tree():
    return {
        "conv_body": {
            "res1_conv": {"conv": {"kernel": jnp.ones((2, 2))}},
            "res2": {"block0": {"conv1": {"conv": {"kernel": jnp.ones((2, 2))}}}},
            "res4": {
                "block0": {
                    "bn1": {"scale": jnp.ones((2,)), "bias": jnp.zeros((2,))},
                    "conv1": {"conv": {"kernel": jnp.ones((2, 2))}},
                }
            },
        },
        "cls_iou": {
            "classifier": {
                "dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros((2,))}
            }
        },
    }


def test_build_masks_freeze_and_bias_groups():
    params = _tree()
    trainable, bias = build_masks(params, ["res1", "res2"])
    assert trainable["conv_body"]["res1_conv"]["conv"]["kernel"] is False
    assert trainable["conv_body"]["res2"]["block0"]["conv1"]["conv"]["kernel"] is False
    assert trainable["conv_body"]["res4"]["block0"]["conv1"]["conv"]["kernel"] is True
    # BN beta is in the bias group (named_parameters 'bias' match), gamma not
    assert bias["conv_body"]["res4"]["block0"]["bn1"]["bias"] is True
    assert bias["conv_body"]["res4"]["block0"]["bn1"]["scale"] is False
    assert bias["cls_iou"]["classifier"]["dense"]["bias"] is True


def test_sgd_matches_torch_semantics():
    import torch

    cfg = get_default_cfg()
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.WEIGHT_DECAY = 0.01
    cfg.SOLVER.BIAS_DOUBLE_LR = True
    cfg.SOLVER.BIAS_WEIGHT_DECAY = False
    cfg.SOLVER.SCALE_MOMENTUM = False

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    b0 = np.array([0.5, -0.5], np.float32)
    gw = np.array([0.1, 0.2, -0.3], np.float32)
    gb = np.array([0.05, -0.02], np.float32)
    lr = 0.1

    # torch oracle
    tw = torch.tensor(w0, requires_grad=True)
    tb = torch.tensor(b0, requires_grad=True)
    opt = torch.optim.SGD(
        [
            {"params": [tw], "lr": lr, "weight_decay": 0.01},
            {"params": [tb], "lr": lr * 2, "weight_decay": 0.0},
        ],
        momentum=0.9,
    )
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.tensor(gw)
        tb.grad = torch.tensor(gb)
        opt.step()

    # ours
    params = {"layer": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    grads = {"layer": {"kernel": jnp.asarray(gw), "bias": jnp.asarray(gb)}}
    trainable, bias = build_masks(params, [])
    init, update = make_sgd(cfg, trainable, bias)
    state = init(params)
    for _ in range(3):
        params, state = update(grads, state, params, lr)

    np.testing.assert_allclose(
        np.asarray(params["layer"]["kernel"]), tw.detach().numpy(), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(params["layer"]["bias"]), tb.detach().numpy(), rtol=1e-5
    )


def test_momentum_correction_on_decay():
    cfg = get_default_cfg()
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.BIAS_DOUBLE_LR = False
    cfg.SOLVER.SCALE_MOMENTUM = True
    cfg.SOLVER.SCALE_MOMENTUM_THRESHOLD = 1.1

    params = {"w": jnp.asarray([1.0])}
    grads = {"w": jnp.asarray([1.0])}
    trainable, bias = build_masks(params, [])
    init, update = make_sgd(cfg, trainable, bias)
    state = init(params)
    params, state = update(grads, state, params, 0.1)
    v1 = float(state.momentum["w"][0])
    assert abs(v1 - 1.0) < 1e-6  # v = g
    # decay x0.1 -> buffer scaled by 0.1 before momentum accumulation
    params, state = update(grads, state, params, 0.01)
    v2 = float(state.momentum["w"][0])
    assert abs(v2 - (0.9 * 0.1 * v1 + 1.0)) < 1e-6
    # small change (< threshold ratio): no correction
    params, state = update(grads, state, params, 0.0099)
    v3 = float(state.momentum["w"][0])
    assert abs(v3 - (0.9 * v2 + 1.0)) < 1e-6


def test_frozen_params_never_move():
    cfg = get_default_cfg()
    params = {
        "conv_body": {"res1_conv": {"conv": {"kernel": jnp.ones((2,))}}},
        "head": {"dense": {"kernel": jnp.ones((2,))}},
    }
    grads = jax.tree.map(jnp.ones_like, params)
    trainable, bias = build_masks(params, ["res1"])
    init, update = make_sgd(cfg, trainable, bias)
    state = init(params)
    for _ in range(3):
        params, state = update(grads, state, params, 0.1)
    np.testing.assert_array_equal(
        np.asarray(params["conv_body"]["res1_conv"]["conv"]["kernel"]), [1, 1]
    )
    assert (np.asarray(params["head"]["dense"]["kernel"]) != 1).all()


def test_adam_matches_torch_semantics():
    import torch

    from cim_tpu.engine.optimizer import make_adam

    cfg = get_default_cfg()
    cfg.SOLVER.WEIGHT_DECAY = 0.01
    cfg.SOLVER.BIAS_DOUBLE_LR = True
    cfg.SOLVER.BIAS_WEIGHT_DECAY = False

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    b0 = np.array([0.5, -0.5], np.float32)
    gw = np.array([0.1, 0.2, -0.3], np.float32)
    gb = np.array([0.05, -0.02], np.float32)
    lr = 0.01

    tw = torch.tensor(w0, requires_grad=True)
    tb = torch.tensor(b0, requires_grad=True)
    opt = torch.optim.Adam(
        [
            {"params": [tw], "lr": lr, "weight_decay": 0.01},
            {"params": [tb], "lr": lr * 2, "weight_decay": 0.0},
        ]
    )
    for _ in range(4):
        opt.zero_grad()
        tw.grad = torch.tensor(gw)
        tb.grad = torch.tensor(gb)
        opt.step()

    params = {"layer": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    grads = {"layer": {"kernel": jnp.asarray(gw), "bias": jnp.asarray(gb)}}
    trainable, bias = build_masks(params, [])
    init, update = make_adam(cfg, trainable, bias)
    state = init(params)
    for _ in range(4):
        params, state = update(grads, state, params, lr)

    np.testing.assert_allclose(
        np.asarray(params["layer"]["kernel"]), tw.detach().numpy(), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(params["layer"]["bias"]), tb.detach().numpy(), rtol=1e-5
    )
