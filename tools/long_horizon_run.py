#!/usr/bin/env python
"""Segmented long-horizon training driver.

Runs tools/train.py --synthetic for `--total_steps` in fresh-process
segments of `--segment_steps`, each segment resuming the previous one's
checkpoint (`--load_ckpt ... --resume`). Fresh processes bound the
documented axon-tunnel RSS leak (CLAUDE.md: ~MB-per-step host growth —
not present on real TPU VMs); the segmentation itself exercises the
production crash-save/resume path at horizon, including the LR decay
boundary (`--decay_at` -> SOLVER.STEPS) crossed mid-run and warmup at
the start, per the reference schedule semantics
(reference tools/train.py:407-416; 90k budget
configs/resnet50_voc.yaml:22-26, scaled down here).

Collects every TrainingStats JSON line ({"iter": ...}) across segments
and writes one result JSON with the loss + mining-health
(fg_frac/mined_gt/has_gt) trajectory, the measured LR drop at the decay
boundary, and per-segment boundary continuity (loss deltas across
resume points).

Usage (TPU):
  python tools/long_horizon_run.py --total_steps 5000 --segment_steps 500 \
      --decay_at 3000 --out RUN_r04.json
CPU smoke:
  JAX_PLATFORMS=cpu python tools/long_horizon_run.py --total_steps 24 \
      --segment_steps 12 --decay_at 16 --warmup 4 --disp 4 \
      --synth_image 64 64 --synth_props 32 --synth_valid 24 \
      --set MODEL.CONV_BODY tiny.conv_body TPU.DATA_PARALLEL 1 \
      --out /tmp/r.json
"""
import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STATS_RE = re.compile(r'(\{"iter": .*\})')


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default=os.path.join(REPO, "configs", "resnet50_voc.yaml"))
    p.add_argument("--total_steps", type=int, default=5000)
    p.add_argument("--segment_steps", type=int, default=500)
    p.add_argument("--decay_at", type=int, default=3000,
                   help="SOLVER.STEPS decay boundary (scaled-down 60k)")
    p.add_argument("--warmup", type=int, default=500,
                   help="SOLVER.WARM_UP_ITERS")
    p.add_argument("--disp", type=int, default=20)
    p.add_argument("--iter_size", type=int, default=4)
    p.add_argument("--devices", type=int, default=1,
                   help="device count the segments will see (1 TPU chip)")
    p.add_argument("--synth_image", nargs=2, type=int, default=(256, 256))
    p.add_argument("--synth_props", type=int, default=512)
    p.add_argument("--synth_valid", type=int, default=300)
    p.add_argument("--workdir", default=None)
    p.add_argument("--out", default="RUN_r04.json")
    p.add_argument("--resume_from", default=None,
                   help="partial artifact from an interrupted run; continues "
                        "from the next segment (requires --workdir pointing "
                        "at the same checkpoint dir)")
    p.add_argument("--set", dest="set_cfgs", nargs="+", default=[])
    return p.parse_args()


def _prescale_decay(args):
    """train.py rescales SOLVER.STEPS by NUM_GPUS/(iter_size*devices)
    (the reference's batch/LR/step auto-rescale, train.py:184-221);
    --decay_at is in OPTIMIZER steps, so invert the scale here."""
    from cim_tpu.config import cfg_from_file, get_default_cfg

    cfg = get_default_cfg()
    cfg_from_file(cfg, args.cfg)
    return int(round(args.decay_at * args.iter_size * args.devices
                     / cfg.NUM_GPUS))


def run_segment(args, seg_idx, workdir, max_iter):
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "train.py"),
        "--synthetic", "--cfg", args.cfg,
        "--max_iter", str(max_iter),
        "--disp_interval", str(args.disp),
        "--iter_size", str(args.iter_size),
        "--output_dir", workdir,
        "--synth_image", str(args.synth_image[0]), str(args.synth_image[1]),
        "--synth_props", str(args.synth_props),
        "--synth_valid", str(args.synth_valid),
        # continuous-ish data stream: new segment, new synthetic draw
        "--seed", str(3 + seg_idx),
        # reference convention: STEPS[0] is the start (0), decays at the
        # remaining entries (lib/utils/net.py steps_with_decay); value is
        # pre-scaled so the rescale in train.py lands it at --decay_at
        "--set", "SOLVER.STEPS", f"[0,{_prescale_decay(args)}]",
        "SOLVER.WARM_UP_ITERS", str(args.warmup),
        # snapshot only at segment end (the driver's final save)
        "TRAIN.SNAPSHOT_ITERS", str(10**9),
    ] + list(args.set_cfgs)
    if seg_idx > 0:
        cmd += ["--load_ckpt", os.path.join(workdir, "ckpt"), "--resume"]
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    dt = time.time() - t0
    log = r.stdout + r.stderr
    stats = [json.loads(m.group(1)) for m in STATS_RE.finditer(log)]
    if r.returncode != 0:
        sys.stderr.write(log[-4000:] + "\n")
    return r.returncode, stats, dt, log


def main():
    args = parse_args()
    workdir = args.workdir or tempfile.mkdtemp(prefix="long_run_")
    os.makedirs(workdir, exist_ok=True)

    n_segments = (args.total_steps + args.segment_steps - 1) // args.segment_steps
    trajectory = []
    seg_summaries = []
    boundary_losses = []
    start_seg = 0
    if args.resume_from:
        with open(args.resume_from) as f:
            prev = json.load(f)
        assert prev["segment_steps"] == args.segment_steps, "segment mismatch"
        assert prev["total_steps"] == args.total_steps, "total mismatch"
        assert args.workdir, "--resume_from requires --workdir (ckpt dir)"
        trajectory = prev["trajectory_every_disp"]
        boundary_losses = prev["segment_boundaries"]
        seg_summaries = prev["segments_wall"]
        start_seg = len(seg_summaries)
        print(json.dumps({"resumed_at_segment": start_seg,
                          "steps_done": prev["steps_completed"]}), flush=True)
    for seg in range(start_seg, n_segments):
        max_iter = min((seg + 1) * args.segment_steps, args.total_steps)
        rc, stats, dt, log = run_segment(args, seg, workdir, max_iter)
        if rc != 0:
            # keep the trajectory captured so far; merge the error fields
            # into the summary instead of discarding the partial artifact
            failed = _summarize(args, n_segments, trajectory, boundary_losses,
                                seg_summaries, partial=True)
            failed.update({"ok": False, "failed_segment": seg, "rc": rc,
                           "error_tail": log[-1500:]})
            _write(args.out, failed)
            sys.exit(1)
        # stats lines from THIS segment only (iter > previous max)
        prev_max = trajectory[-1]["iter"] if trajectory else -1
        fresh = [s for s in stats if s["iter"] > prev_max]
        trajectory.extend(fresh)
        if fresh:
            boundary_losses.append(
                {"segment": seg, "first_iter": fresh[0]["iter"],
                 "first_loss": fresh[0]["loss"], "last_iter": fresh[-1]["iter"],
                 "last_loss": fresh[-1]["loss"]}
            )
        seg_summaries.append({"segment": seg, "max_iter": max_iter,
                              "wall_s": round(dt, 1), "stats_lines": len(fresh)})
        print(json.dumps(seg_summaries[-1]), flush=True)
        # partial artifact after every segment: a wall-clock-bounded run
        # still leaves the trajectory captured so far (the final segment's
        # full artifact is written once, after the loop)
        if seg + 1 < n_segments:
            _write(args.out, _summarize(args, n_segments, trajectory,
                                        boundary_losses, seg_summaries,
                                        partial=True))

    result = _summarize(args, n_segments, trajectory, boundary_losses,
                        seg_summaries, partial=False)
    _write(args.out, result)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "trajectory_every_disp"}), flush=True)
    sys.exit(0 if result["ok"] else 1)


def _summarize(args, n_segments, trajectory, boundary_losses, seg_summaries,
               partial):
    losses = [s["loss"] for s in trajectory]
    lrs = {s["iter"]: s["lr"] for s in trajectory}
    pre = [lr for it, lr in lrs.items() if args.warmup <= it < args.decay_at]
    post = [lr for it, lr in lrs.items() if it >= args.decay_at + args.disp]
    import numpy as np

    # mining health at the end vs start (median over the last/first 5 lines)
    def med(key, rows):
        vals = [r[k] for r in rows for k in r if k.startswith(key)]
        return round(float(np.median(vals)), 4) if vals else None

    head, tail = trajectory[:5], trajectory[-5:]
    return {
        "ok": bool(losses) and all(np.isfinite(losses)),
        "partial": partial,
        "steps_completed": trajectory[-1]["iter"] + 1 if trajectory else 0,
        "total_steps": args.total_steps,
        "segments": n_segments,
        "segment_steps": args.segment_steps,
        "decay_at": args.decay_at,
        "warmup": args.warmup,
        "first_loss": losses[0] if losses else None,
        "final_loss": losses[-1] if losses else None,
        "loss_decreased": bool(losses and losses[-1] < losses[0]),
        "lr_pre_decay": pre[-1] if pre else None,
        "lr_post_decay": post[0] if post else None,
        "lr_decay_ratio": round(post[0] / pre[-1], 4) if pre and post else None,
        "mining_health": {
            "fg_frac_start": med("fg_frac", head),
            "fg_frac_end": med("fg_frac", tail),
            "mined_gt_start": med("mined_gt", head),
            "mined_gt_end": med("mined_gt", tail),
            "has_gt_end": med("has_gt", tail),
        },
        "segment_boundaries": boundary_losses,
        "segments_wall": seg_summaries,
        "trajectory_every_disp": trajectory,
    }


def _write(path, obj):
    # atomic replace: a kill mid-write must leave the previous good partial
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


if __name__ == "__main__":
    main()
