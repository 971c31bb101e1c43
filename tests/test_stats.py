"""TrainingStats / SmoothedValue / Timer semantics.

Reference contracts: lib/utils/logging.py:60-83 (SmoothedValue median over
a deque window), lib/utils/training_stats.py:36-167 (per-loss smoothing,
disp_interval gating), lib/utils/timer.py:8-35 (tic/toc averaging).
"""
import numpy as np

from cim_tpu.engine.stats import SmoothedValue, Timer, TrainingStats


def test_smoothed_value_median_window():
    sv = SmoothedValue(window_size=4)
    for v in [1.0, 100.0, 2.0, 3.0, 4.0, 5.0]:
        sv.add_value(v)
    # window holds the LAST 4 values [2, 3, 4, 5]
    assert sv.get_median_value() == np.median([2, 3, 4, 5])
    assert sv.get_average_value() == np.mean([2, 3, 4, 5])
    # global average is over ALL values (reference logging.py:78-80)
    np.testing.assert_allclose(
        sv.get_global_average_value(), np.mean([1, 100, 2, 3, 4, 5])
    )


def test_training_stats_smoothing_and_gating():
    ts = TrainingStats(disp_interval=2, window=3)
    for i in range(6):
        ts.update_iter_stats(
            {
                "total_loss": float(i),
                "bag_loss": float(10 + i),
                "mined_gt_0": float(i % 2),
                "not_a_metric": 999.0,
            }
        )
    # off-interval iterations emit nothing
    assert ts.log_iter_stats(3, lr=0.1) is None
    stats = ts.log_iter_stats(4, lr=0.1, max_iter=100)
    # window=3 -> median of the last three values
    assert stats["loss"] == np.median([3, 4, 5])
    assert stats["bag_loss"] == np.median([13, 14, 15])
    # mining health metrics are tracked; unrelated keys are not
    assert "mined_gt_0" in stats
    assert "not_a_metric" not in stats
    assert "eta" in stats and stats["lr"] == 0.1


def test_timer_tic_toc():
    t = Timer()
    t.tic()
    d1 = t.toc(average=False)
    t.tic()
    d2 = t.toc(average=False)
    assert t.calls == 2
    np.testing.assert_allclose(t.average_time, (t.total_time) / 2)
    assert d1 >= 0 and d2 >= 0
    t.reset()
    assert t.calls == 0 and t.total_time == 0.0
