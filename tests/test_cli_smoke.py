"""CLI smoke tests: the tools run end-to-end as subprocesses on the CPU
backend with synthetic data (the reference ships no runnable tests at
all — SURVEY.md §4)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=560):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, capture_output=True,
        text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_train_cli_synthetic(tmp_path):
    out = _run(
        [
            "tools/train.py", "--synthetic",
            "--cfg", "configs/resnet50_voc.yaml",
            "--set", "MODEL.CONV_BODY", "tiny.conv_body",
            "TPU.PROPOSAL_PAD", "64", "TPU.MAX_CLUSTERS", "8",
            "TPU.DATA_PARALLEL", "1",
            "--iter_size", "2", "--max_iter", "3",
            "--output_dir", str(tmp_path / "out"),
            "--disp_interval", "1",
        ]
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "Training done at step 3" in out.stderr or "Training done" in out.stderr
    # checkpoint written
    ckpt = tmp_path / "out" / "ckpt"
    assert ckpt.is_dir() and any(ckpt.iterdir())


@pytest.mark.slow
def test_change_mask_thr_cli(tmp_path):
    data = {
        "images": [{"id": 1}],
        "annotations": [
            {"id": 1, "image_id": 1, "score": 0.9},
            {"id": 2, "image_id": 1, "score": 0.1},
        ],
        "categories": [],
    }
    src = tmp_path / "labels.json"
    src.write_text(json.dumps(data))
    out = _run(
        ["tools/change_mask_thr.py", "--input", str(src), "--thr", "0.3"],
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    filtered = json.loads((tmp_path / "labels_thr0.3.json").read_text())
    assert len(filtered["annotations"]) == 1
