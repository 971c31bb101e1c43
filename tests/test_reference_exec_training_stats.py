"""Golden parity against the *executed* reference training statistics.

/root/reference/lib/utils/training_stats.py:36-167 (TrainingStats with
the iter_size inner-accumulation protocol) and lib/utils/logging.py:60-83
(SmoothedValue) run for real on a randomized loss schedule; the resulting
smoothed medians and the LogIterStats gating decisions are the oracle for
cim_tpu.engine.stats.TrainingStats.

The mapping under test: the reference feeds UpdateIterStats once per
INNER iter with per-GPU loss vectors, smoothing the mean over
(iter_size, NUM_GPUS) at the last inner iter
(training_stats.py:88-120, _mean_and_reset_inner_list); the TPU engine
reports one pre-reduced metrics dict per step — lax.scan-summed losses
divided by GRAD_ACCUM and pmean'd over "dp" (engine/train.py:253-261) —
so feeding ours the means must reproduce the reference's smoothed
window exactly. tests/test_stats.py pins the window/median mechanics in
isolation; THIS module pins the cross-protocol equivalence with the
reference deciding for itself when values enter the window and when a
log line fires (incl. the MAX_ITER-1 final-iter rule that our train CLI
mirrors with its force=True flush, tools/train.py).
"""
from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest
import torch

from cim_tpu.engine.stats import SmoothedValue, TrainingStats

REF_LIB = "/root/reference/lib"


@pytest.fixture(scope="module")
def ref_mods():
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
        ts = importlib.import_module("utils.training_stats")
        ref_logging = importlib.import_module("utils.logging")
        cfg_mod = importlib.import_module("core.config")
    finally:
        sys.path.remove(REF_LIB)
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return ts, ref_logging, cfg_mod


def test_smoothed_value_parity(ref_mods):
    """Window median / window average / global average vs the executed
    reference SmoothedValue on a shared random series crossing the
    window boundary (logging.py:60-83)."""
    _, ref_logging, _ = ref_mods
    rng = np.random.RandomState(0)
    series = rng.uniform(0, 5, size=50).astype(np.float32)

    ref = ref_logging.SmoothedValue(20)
    ours = SmoothedValue(20)
    for i, v in enumerate(series):
        ref.AddValue(float(v))
        ours.add_value(float(v))
        if i % 7 == 0 or i == len(series) - 1:
            np.testing.assert_allclose(
                ours.get_median_value(), ref.GetMedianValue(), rtol=1e-6
            )
            np.testing.assert_allclose(
                ours.get_average_value(), ref.GetAverageValue(), rtol=1e-6
            )
            np.testing.assert_allclose(
                ours.get_global_average_value(),
                ref.GetGlobalAverageValue(),
                rtol=1e-6,
            )


LOSS_KEYS = ["bag_loss", "pcl_loss", "cls_loss", "iou_loss"]


def _run_reference(ts_mod, cfg_mod, schedule, iter_size, num_gpus, max_iter):
    """Drive the executed reference TrainingStats through the schedule.

    schedule: (steps, iter_size, num_gpus, K) per-loss values. Returns
    (per-step stats dicts from GetStats, list of iters where LogIterStats
    actually fired)."""
    cfg_mod.cfg.immutable(False)
    old_num_gpus = cfg_mod.cfg.NUM_GPUS
    old_max_iter = cfg_mod.cfg.SOLVER.MAX_ITER
    cfg_mod.cfg.NUM_GPUS = num_gpus
    cfg_mod.cfg.SOLVER.MAX_ITER = max_iter

    misc_args = types.SimpleNamespace(iter_size=iter_size)
    ts = ts_mod.TrainingStats(misc_args, log_period=4, tensorboard_logger=None)

    logged_iters = []
    orig_log_stats = ts_mod.log_stats
    ts_mod.log_stats = lambda stats, args: logged_iters.append(stats["iter"])
    stats_per_step = []
    try:
        for step in range(schedule.shape[0]):
            for inner in range(iter_size):
                model_out = {
                    "losses": {
                        k: torch.tensor(schedule[step, inner, :, j])
                        for j, k in enumerate(LOSS_KEYS)
                    }
                }
                ts.UpdateIterStats(model_out, inner_iter=inner)
            ts.LogIterStats(step, lr=1e-3)
            stats_per_step.append(ts.GetStats(step, lr=1e-3))
    finally:
        ts_mod.log_stats = orig_log_stats
        cfg_mod.cfg.NUM_GPUS = old_num_gpus
        cfg_mod.cfg.SOLVER.MAX_ITER = old_max_iter
    return stats_per_step, logged_iters


def test_training_stats_inner_accum_parity(ref_mods):
    """The reference's (iter_size, NUM_GPUS) inner accumulation vs our
    single pre-reduced metrics dict per step: smoothed medians for every
    loss key and the total must agree at every step, and the LogIterStats
    firing pattern (log_period + MAX_ITER-1) must match our
    disp_interval + final-step force flush."""
    ts_mod, _, cfg_mod = ref_mods
    steps, iter_size, num_gpus = 30, 4, 2
    rng = np.random.RandomState(1)
    schedule = rng.uniform(0.01, 2.0, size=(steps, iter_size, num_gpus, len(LOSS_KEYS))).astype(np.float32)

    ref_stats, ref_logged = _run_reference(
        ts_mod, cfg_mod, schedule, iter_size, num_gpus, max_iter=steps
    )

    ours = TrainingStats(disp_interval=4, window=20)
    our_logged = []
    for step in range(steps):
        # what engine/train.py reports: scan-summed / accum, pmean over dp
        per_key = schedule[step].mean(axis=(0, 1))  # mean over inner+gpus
        metrics = {k: float(per_key[j]) for j, k in enumerate(LOSS_KEYS)}
        metrics["total_loss"] = float(per_key.sum())
        ours.update_iter_stats(metrics)
        force = step == steps - 1  # train CLI's final pending flush
        if ours.log_iter_stats(step, lr=1e-3, max_iter=steps, force=force) is not None:
            our_logged.append(step)

        ref = ref_stats[step]
        np.testing.assert_allclose(
            ours.smoothed_total.get_median_value(), ref["loss"], rtol=1e-5
        )
        for k in LOSS_KEYS:
            np.testing.assert_allclose(
                ours.smoothed_losses[k].get_median_value(),
                ref["head_losses"][k],
                rtol=1e-5,
            )

    # gating parity: reference logs on cur_iter % log_period == 0 OR
    # cur_iter == MAX_ITER-1 (training_stats.py:132-134); its stats carry
    # iter = cur_iter + 1 (1-indexed, :152). Ours logs 0-indexed iters.
    assert [i - 1 for i in ref_logged] == our_logged
    assert our_logged[-1] == steps - 1  # the final force flush fired


def _patch_time(monkeypatch, mod, times):
    it = iter(times)
    monkeypatch.setattr(mod, "time", types.SimpleNamespace(time=lambda: next(it)))


def test_timer_parity(ref_mods, monkeypatch):
    """Drive both Timers with the same fake clock sequence; totals,
    per-call diffs and running averages must match exactly."""
    import importlib as _imp

    sys.path.insert(0, REF_LIB)
    try:
        ref_timer_mod = _imp.import_module("utils.timer")
    finally:
        sys.path.remove(REF_LIB)

    ticks = [0.0, 1.5, 2.0, 5.0, 5.5, 6.25, 7.0, 10.0]
    import cim_tpu.engine.stats as our_stats_mod

    _patch_time(monkeypatch, ref_timer_mod, ticks)
    _patch_time(monkeypatch, our_stats_mod, list(ticks))

    ref_t = ref_timer_mod.Timer()
    our_t = our_stats_mod.Timer()
    for _ in range(4):
        ref_t.tic()
        our_t.tic()
        ref_avg = ref_t.toc(average=True)
        our_avg = our_t.toc(average=True)
        assert our_avg == ref_avg
        assert our_t.diff == ref_t.diff
        assert our_t.total_time == ref_t.total_time
        assert our_t.calls == ref_t.calls
