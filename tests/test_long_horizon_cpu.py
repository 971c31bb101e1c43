"""tools/long_horizon_run.py — the segmented checkpoint+resume driver
(VERDICT r4 item 3's machinery) driven end-to-end on CPU.

The TPU run (5k steps, decay at 3k) depends on the axon tunnel; THIS test
pins the driver's mechanics at tiny scale so they can't rot: fresh
process per segment, --resume stitching with no step gap or repeat, the
SOLVER.STEPS decay boundary crossed MID-run landing exactly where
--decay_at says despite train.py's device/iter_size rescale
(reference tools/train.py:407-416 semantics), warmup at the start, and
the mining-health trajectory surfaced in the output JSON.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_segmented_run_crosses_decay(tmp_path):
    out = tmp_path / "run.json"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO  # drop the axon sitecustomize
    env.pop("XLA_FLAGS", None)
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "long_horizon_run.py"),
        "--total_steps", "24", "--segment_steps", "12",
        "--decay_at", "16", "--warmup", "4", "--disp", "4",
        "--synth_image", "64", "64", "--synth_props", "32",
        "--synth_valid", "24",
        "--workdir", str(tmp_path / "seg"),
        "--set", "MODEL.CONV_BODY", "tiny.conv_body",
        "TPU.DATA_PARALLEL", "1",
        "--out", str(out),
    ]
    r = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                       text=True, timeout=1800)
    assert r.returncode == 0, (r.stdout + r.stderr)[-3000:]
    res = json.loads(out.read_text())

    assert res["ok"] is True
    assert res["segments"] == 2

    # two-segment stitch: strictly increasing iters across the boundary,
    # second segment resumes at step 12 (no gap, no repeat)
    iters = [s["iter"] for s in res["trajectory_every_disp"]]
    assert iters == sorted(set(iters))
    seg_bounds = res["segment_boundaries"]
    assert seg_bounds[0]["first_iter"] == 0
    assert seg_bounds[1]["first_iter"] == 12
    assert seg_bounds[0]["last_iter"] < 12 <= seg_bounds[1]["first_iter"]

    # the decay boundary was actually crossed mid-run: post/pre LR ratio
    # equals SOLVER.GAMMA (0.1 in resnet50_voc.yaml)
    assert res["lr_pre_decay"] is not None and res["lr_post_decay"] is not None
    assert abs(res["lr_decay_ratio"] - 0.1) < 1e-6

    # warmup: the first logged LR (iter 0, inside warmup) is below the
    # pre-decay base LR (reference lib/utils/net.py warmup ramp)
    lr0 = res["trajectory_every_disp"][0]["lr"]
    assert lr0 < res["lr_pre_decay"]

    # losses finite end-to-end; mining health surfaced
    assert res["first_loss"] is not None and res["final_loss"] is not None
    mh = res["mining_health"]
    assert mh["fg_frac_end"] is not None and mh["has_gt_end"] is not None
