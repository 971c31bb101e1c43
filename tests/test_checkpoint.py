import numpy as np
import jax
import jax.numpy as jnp

from cim_tpu.engine.checkpoint import latest_step, load_ckpt, save_ckpt
from cim_tpu.engine.optimizer import SGDState
from cim_tpu.engine.train import TrainState


def _state(seed, step):
    k = jax.random.PRNGKey(seed)
    params = {"layer": {"kernel": jax.random.normal(k, (4, 3)), "bias": jnp.zeros(3)}}
    mom = jax.tree.map(jnp.ones_like, params)
    return TrainState(
        params=params,
        opt_state=SGDState(momentum=mom, prev_lr=jnp.asarray(0.01)),
        step=jnp.asarray(step, jnp.int32),
    )


def test_checkpoint_roundtrip(tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    state = _state(0, 7)
    stats = {"bn": {"mean": jnp.arange(3.0), "var": jnp.ones(3)}}
    save_ckpt(ckpt_dir, state, stats)
    assert latest_step(ckpt_dir) == 7

    blank = _state(1, 0)
    restored, rstats = load_ckpt(ckpt_dir, blank, stats)
    np.testing.assert_allclose(
        np.asarray(restored.params["layer"]["kernel"]),
        np.asarray(state.params["layer"]["kernel"]),
    )
    np.testing.assert_allclose(
        np.asarray(restored.opt_state.momentum["layer"]["bias"]), 1.0
    )
    # state.step counts COMPLETED steps (= index of the next step to run),
    # so resume restores it exactly; the reference's ckpt.step+1
    # (train.py:328) is the same point in its last-completed-index counter
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(rstats["bn"]["mean"]), [0, 1, 2])


def test_checkpoint_keeps_multiple(tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    stats = {}
    for s in (1, 2, 3):
        save_ckpt(ckpt_dir, _state(s, s), stats)
    assert latest_step(ckpt_dir) == 3
    restored, _ = load_ckpt(ckpt_dir, _state(0, 0), stats, step=2)
    assert int(restored.step) == 2


def test_wait_for_checkpoint(tmp_path):
    """wait_for_checkpoint polls until a snapshot appears (the eval-launched-
    before-training contract, reference tools/test_net.py:156-163)."""
    import threading

    import pytest

    from cim_tpu.engine.checkpoint import wait_for_checkpoint

    ckpt_dir = str(tmp_path / "ckpt")
    with pytest.raises(TimeoutError):
        wait_for_checkpoint(ckpt_dir, poll_s=0.05, timeout_s=0.2)

    state, stats = _state(0, 5), {}

    def writer():
        import time

        time.sleep(0.5)
        save_ckpt(ckpt_dir, state, stats)

    t = threading.Thread(target=writer)
    t.start()
    step = wait_for_checkpoint(ckpt_dir, poll_s=0.05, timeout_s=30)
    t.join()
    assert step == int(state.step)
