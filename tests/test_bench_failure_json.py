"""bench.py structured-failure contract (VERDICT r3 item 1).

The driver parses bench.py's single JSON line; on failure it must see
ok=false with retryable=true ONLY for transient tunnel faults — a
deterministic failure (OOM, shape bug, integrity assert) marked
retryable would re-queue an hour-long bench forever.
"""
import json

import pytest


@pytest.fixture()
def bench(monkeypatch):
    import bench as mod

    return mod


def _run_main_capture(bench, monkeypatch, capsys, exc):
    monkeypatch.setenv("BENCH_FORCE_CPU", "1")
    monkeypatch.setattr(bench, "run_bench", lambda: (_ for _ in ()).throw(exc))
    # BENCH_FORCE_CPU path flips jax config; keep it off the axon probe
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 1
    line = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(line)


def test_transient_failure_is_retryable(bench, monkeypatch, capsys):
    out = _run_main_capture(
        bench, monkeypatch, capsys,
        RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE"),
    )
    assert out["ok"] is False and out["retryable"] is True


def test_oom_is_not_retryable(bench, monkeypatch, capsys):
    out = _run_main_capture(
        bench, monkeypatch, capsys,
        RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating 16G"),
    )
    assert out["ok"] is False and out["retryable"] is False


def test_integrity_assert_is_not_retryable(bench, monkeypatch, capsys):
    out = _run_main_capture(
        bench, monkeypatch, capsys,
        AssertionError("scale 480: implied MFU 1.40 > 1"),
    )
    assert out["ok"] is False and out["retryable"] is False
    assert "integrity" in out["reason"]


def test_failure_line_keeps_metric_schema(bench, monkeypatch, capsys):
    out = _run_main_capture(bench, monkeypatch, capsys, ValueError("boom"))
    assert out["metric"] == "train_images_per_sec_per_chip_protocol"
    assert out["value"] == 0.0 and out["vs_baseline"] == 0.0
    assert out["retryable"] is False


def test_baseline_basis_without_artifact(bench, monkeypatch, tmp_path):
    # no committed anchor artifact -> flop-estimate basis only
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    basis = bench._baseline_basis()
    assert basis["anchor"] == "flop_estimate"
    assert basis["reference_imgs_per_sec_per_device"] == 0.5
    assert "measured_same_cpu_step_ratio" not in basis


def test_baseline_basis_with_artifact(bench, tmp_path, monkeypatch):
    art = {
        "measured_cpu_ratio": 3.5,
        "n_valid": 48,
        "image_hw": [96, 128],
    }
    (tmp_path / "BENCH_CPU_ANCHOR.json").write_text(json.dumps(art))
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    basis = bench._baseline_basis()
    assert basis["measured_same_cpu_step_ratio"] == 3.5
    assert basis["measured_same_cpu_shape"] == "48x96x128"
