"""Golden parity against the *executed* reference change_mask_thr CLI.

/root/reference/tools/change_mask_thr.py runs as a real subprocess over
a shared pseudo-label json and its output is the oracle for
tools/change_mask_thr.py: the strict `score < thr` drop rule (a score
exactly at the threshold survives), the dense id renumbering of
survivors from 1 (this caught a real divergence: we kept original ids),
and the preserved images/categories lists.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fixture(tmp_path):
    rng = np.random.RandomState(0)
    anns = []
    scores = [0.05, 0.3, 0.31, 0.95, 0.29999, 0.3, 0.8]
    for i, s in enumerate(scores):
        anns.append({
            "id": 100 + i,  # deliberately non-dense original ids
            "image_id": 1 + i % 2,
            "category_id": 1 + i % 3,
            "iscrowd": 0,
            "area": int(rng.randint(10, 100)),
            "bbox": [1, 2, 3, 4],
            "segmentation": {"size": [10, 10], "counts": "some"},
            "score": s,
        })
    data = {
        "images": [{"id": 1, "file_name": "a.jpg"},
                   {"id": 2, "file_name": "b.jpg"}],
        "categories": [{"id": c, "name": f"c{c}"} for c in (1, 2, 3)],
        "annotations": anns,
    }
    with open(tmp_path / "msrcnn_pseudo_label.json", "w") as f:
        json.dump(data, f)
    return data


def test_change_thr_cli_matches_executed_reference(tmp_path):
    _fixture(tmp_path)
    thr = 0.3

    out = subprocess.run(
        [sys.executable, "/root/reference/tools/change_mask_thr.py",
         "--output_dir", str(tmp_path), "--thr", str(thr)],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    with open(tmp_path / f"msrcnn_pseudo_label_{thr}.json") as f:
        want = json.load(f)

    ours_out = tmp_path / "ours.json"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "change_mask_thr.py"),
         "--input", str(tmp_path / "msrcnn_pseudo_label.json"),
         "--output", str(ours_out), "--thr", str(thr)],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    with open(ours_out) as f:
        got = json.load(f)

    assert got["images"] == want["images"]
    assert got["categories"] == want["categories"]
    assert len(got["annotations"]) == len(want["annotations"]) == 5
    for ga, wa in zip(got["annotations"], want["annotations"]):
        assert ga == wa, (ga, wa)
    # survivors renumbered densely from 1; the score==thr entries survive
    assert [a["id"] for a in got["annotations"]] == [1, 2, 3, 4, 5]
    assert min(a["score"] for a in got["annotations"]) == thr
