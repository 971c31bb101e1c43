#!/usr/bin/env python
"""Two-process multi-host dryrun: real `jax.distributed` execution history
for the multi-host data-parallel path.

The single-process test suite and the 8-device driver dryrun prove
multi-DEVICE correctness; this harness proves multi-PROCESS correctness —
`jax.distributed.initialize` with a localhost coordinator, gloo CPU
collectives, a global mesh spanning both processes' devices, the FULL
production train step fed through `parallel.global_batch`
(jax.make_array_from_process_local_data) and the roidb sharded by
`parallel.host_shard_roidb`, with losses asserted equal to a
single-process run over the same global batch.

This replaces (and evidences) the contract the reference covers with
single-process DataParallel + subprocess eval fan-out
(lib/nn/parallel/data_parallel.py:9, lib/utils/subprocess.py:41-145).

Usage (launcher spawns everything):
  JAX_PLATFORMS=cpu python tools/multihost_dryrun.py \
      [--num_processes 2] [--local_devices 4] [--steps 2]
Exit code 0 + one JSON line on success.
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# deterministic fixture shared by workers and the single-process baseline
BATCH_KW = dict(image_hw=(64, 64), n_props=32, n_valid=24, num_classes=20)
GRAD_ACCUM = 2
SEED = 17
N_ROIDB = 11


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--worker_id", type=int, default=None,
                   help="internal: run as distributed process i")
    p.add_argument("--single", action="store_true",
                   help="internal: single-process baseline over all devices")
    p.add_argument("--num_processes", type=int, default=2)
    p.add_argument("--local_devices", type=int, default=4)
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--port", type=int, default=None)
    p.add_argument("--out", default=None, help="result JSON path")
    p.add_argument("--mode", choices=["train", "resume", "eval"],
                   default="train",
                   help="train: loss parity vs single-process; resume: "
                   "rank-0 checkpoint save -> restart -> all-rank resume "
                   "parity; eval: jax-process-sharded inference merged == "
                   "single-process")
    p.add_argument("--ckpt_dir", default=None,
                   help="internal (resume mode): shared checkpoint dir")
    p.add_argument("--phase", choices=["save", "restore"], default=None,
                   help="internal (resume mode worker phase)")
    p.add_argument("--start_s", type=int, default=0,
                   help="internal: step-index offset for rng derivation")
    p.add_argument("--data_dir", default=None,
                   help="internal (eval mode): synthetic dataset dir")
    p.add_argument("--body", choices=["tiny", "resnet"], default="tiny",
                   help="conv body: tiny (fast CI default) or resnet — the "
                   "PRODUCTION resnet50.torch_resnet50 backbone under "
                   "shard_map across processes (slow CPU compile; use "
                   "--num_processes 2 --local_devices 1 --steps 1)")
    return p.parse_args()


def _setup_jax(n_local_devices):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_local_devices)
    return jax


def _make_cfg(body="tiny"):
    import cim_tpu.models.tiny  # noqa: F401  (registers tiny.conv_body)
    from cim_tpu.config import clone_cfg, get_default_cfg

    cfg = clone_cfg(get_default_cfg())
    if body == "tiny":
        cfg.MODEL.CONV_BODY = "tiny.conv_body"
    # body == "resnet": keep the default production pair
    # (resnet50.torch_resnet50 + resnet50.MaskFuse, configs/resnet50_voc.yaml)
    cfg.TPU.PROPOSAL_PAD = BATCH_KW["n_props"]
    cfg.TPU.MAX_CLUSTERS = 4
    cfg.TPU.GRAD_ACCUM = GRAD_ACCUM
    cfg.TPU.PRECISION = "f32"
    cfg.TPU.PALLAS_ROI_ALIGN = False
    return cfg


def _global_batch_and_sample(n_total_devices):
    import numpy as np

    from cim_tpu.data.synthetic import make_microbatch, make_train_batch

    rng = np.random.RandomState(SEED)
    sample = make_microbatch(rng, **BATCH_KW)
    rng = np.random.RandomState(SEED + 1)
    batch = make_train_batch(rng, n_total_devices, GRAD_ACCUM, **BATCH_KW)
    return batch, sample


def _run_steps(trainer, batch, steps, start_s=0):
    import jax

    out = []
    for s in range(start_s, start_s + steps):
        # rng derived from the step only: identical on every host
        metrics = trainer.step(batch, jax.random.PRNGKey(1000 + s))
        out.append({k: float(v) for k, v in metrics.items()})
    return out


def run_worker(args):
    jax = _setup_jax(args.local_devices)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.worker_id,
    )
    n_total = args.num_processes * args.local_devices
    assert jax.device_count() == n_total
    assert jax.process_count() == args.num_processes

    import jax.numpy  # noqa: F401

    from cim_tpu import parallel
    from cim_tpu.engine.train import Trainer

    cfg = _make_cfg(args.body)
    cfg.TPU.DATA_PARALLEL = n_total
    mesh = parallel.global_data_parallel_mesh()
    assert parallel.is_multiprocess(mesh)
    assert parallel.local_device_count(mesh) == args.local_devices

    # per-host roidb shard (contract: disjoint + covering across processes)
    roidb = [{"id": i} for i in range(N_ROIDB)]
    shard_ids = [e["id"] for e in parallel.host_shard_roidb(roidb)]

    batch, sample = _global_batch_and_sample(n_total)
    # this host feeds exactly the global rows its devices own
    pi = jax.process_index()
    idx = [k for k, d in enumerate(mesh.devices.flat) if d.process_index == pi]
    local_batch = {k: v[idx] for k, v in batch.items()}

    trainer = Trainer(cfg, jax.random.PRNGKey(0), mesh=mesh, sample_batch=sample)
    assert trainer._multiprocess

    # Compile BEFORE the first collective executes: gloo context init has a
    # hard 30s handshake window, and on a loaded single-core host the two
    # workers' step compiles can skew past it (observed flake). AOT-lower
    # and compile the step (warms the persistent compilation cache; no
    # collective runs during compilation), then meet at a
    # coordination-service barrier (long timeout, not gloo-based), so both
    # processes enter the executing step within seconds.
    gbatch = parallel.global_batch(mesh, local_batch)
    trainer._step.lower(trainer.state, gbatch, jax.random.PRNGKey(0)).compile()
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier("cim_mh_warm", 600_000)

    if args.mode == "resume":
        from cim_tpu.engine.checkpoint import load_ckpt, save_ckpt

        if args.phase == "save":
            metrics = _run_steps(trainer, local_batch, args.steps)
            if pi == 0:
                # rank-0-only save (tools/train.py:235): dp-replicated
                # params are fully addressable on the primary host
                save_ckpt(args.ckpt_dir, trainer.state, trainer.stats)
            _dist.global_state.client.wait_at_barrier("cim_mh_saved", 600_000)
        else:  # restore on ALL ranks from the rank-0-written checkpoint
            state, stats = load_ckpt(
                args.ckpt_dir, trainer.state, trainer.stats
            )
            trainer.set_state(state)  # host numpy -> global replicated
            trainer.set_stats(stats)
            metrics = _run_steps(
                trainer, local_batch, args.steps, start_s=args.start_s
            )
    else:
        metrics = _run_steps(trainer, local_batch, args.steps)

    with open(args.out, "w") as f:
        json.dump(
            {"process": pi, "shard_ids": shard_ids, "metrics": metrics}, f
        )
    print(f"worker {pi} done: {[m['total_loss'] for m in metrics]}", flush=True)


def run_single(args):
    n_total = args.num_processes * args.local_devices
    jax = _setup_jax(n_total)

    from cim_tpu.engine.train import Trainer

    cfg = _make_cfg(args.body)
    cfg.TPU.DATA_PARALLEL = n_total
    batch, sample = _global_batch_and_sample(n_total)
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)
    # in resume mode the baseline is the UNINTERRUPTED run over both
    # segments (2·steps); the segmented runs must match it exactly
    steps = args.steps * 2 if args.mode == "resume" else args.steps
    metrics = _run_steps(trainer, batch, steps)
    with open(args.out, "w") as f:
        json.dump({"metrics": metrics}, f)
    print(f"single done: {[m['total_loss'] for m in metrics]}", flush=True)


# ------------------------------ eval mode ------------------------------- #

EVAL_N_IMAGES = 6
EVAL_N_PROPS = 16


def _write_eval_dataset(data_dir):
    """Synthetic COCO-json dataset (+2 gt boxes/image) shared by the
    launcher and every worker (same writer as bench_eval's e2e mode);
    images come from a seeded loader, not disk."""
    import numpy as np

    from cim_tpu.data.synthetic import write_synthetic_coco_dataset

    write_synthetic_coco_dataset(
        data_dir, EVAL_N_IMAGES, EVAL_N_PROPS, np.random.RandomState(SEED),
        image_hw=(64, 96), write_jpegs=False,
    )


def _eval_image_loader(entry):
    import numpy as np

    r = np.random.RandomState(entry["id"])
    return (r.rand(entry["height"], entry["width"], 3) * 255).astype(np.uint8)


def _eval_cfg_and_model(jax, data_dir):
    import numpy as np

    from cim_tpu.data import catalog
    from cim_tpu.data.synthetic import make_microbatch
    from cim_tpu.engine.train import Trainer

    catalog.register_dataset("mh_eval", {
        catalog.IM_DIR: data_dir,
        catalog.ANN_FN: os.path.join(data_dir, "ann.json"),
    })
    cfg = _make_cfg()
    cfg.TPU.DATA_PARALLEL = 1
    cfg.TPU.PROPOSAL_PAD = EVAL_N_PROPS
    cfg.TEST.DATASETS = ("mh_eval",)
    cfg.TEST.SCALE = 64
    cfg.TEST.BBOX_AUG.ENABLED = False
    rng = np.random.RandomState(0)
    sample = make_microbatch(
        rng, image_hw=(64, 64), n_props=EVAL_N_PROPS, n_valid=EVAL_N_PROPS,
        num_classes=20,
    )
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)
    variables = {"params": trainer.state.params, "stats": trainer.stats}
    return cfg, trainer, variables


def run_eval_worker(args):
    """One jax.distributed process evaluating ITS eval_index_range shard
    of the roidb (VERDICT r3 item 5c: real 2-process eval, sharded by
    process index like the reference's subprocess --range fan-out,
    lib/utils/subprocess.py:41-145, but via jax process identity)."""
    import pickle

    jax = _setup_jax(args.local_devices)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.worker_id,
    )
    from cim_tpu import parallel
    from cim_tpu.engine.test_engine import test_net

    cfg, trainer, variables = _eval_cfg_and_model(jax, args.data_dir)
    ind_range = parallel.eval_index_range(EVAL_N_IMAGES)
    part, _, _ = test_net(
        cfg, trainer.model, variables, "mh_eval",
        os.path.join(args.data_dir, "props.pkl"),
        os.path.join(args.data_dir, f"out_w{args.worker_id}"),
        ind_range=ind_range, image_loader=_eval_image_loader,
    )
    with open(args.out + ".pkl", "wb") as f:
        pickle.dump(part, f)
    with open(args.out, "w") as f:
        json.dump({"process": jax.process_index(),
                   "ind_range": list(ind_range), "n": len(part)}, f)
    print(f"eval worker {args.worker_id}: range {ind_range}", flush=True)


def run_eval_single(args):
    import pickle

    jax = _setup_jax(args.local_devices)
    from cim_tpu.engine.test_engine import test_net

    cfg, trainer, variables = _eval_cfg_and_model(jax, args.data_dir)
    full, _, _ = test_net(
        cfg, trainer.model, variables, "mh_eval",
        os.path.join(args.data_dir, "props.pkl"),
        os.path.join(args.data_dir, "out_full"),
        image_loader=_eval_image_loader,
    )
    with open(args.out + ".pkl", "wb") as f:
        pickle.dump(full, f)
    with open(args.out, "w") as f:
        json.dump({"n": len(full)}, f)
    print("eval single done", flush=True)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_and_wait(procs, timeout=3600):
    logs, ok = [], True
    for proc in procs:
        log, _ = proc.communicate(timeout=timeout)
        logs.append(log)
        ok &= proc.returncode == 0
    if not ok:
        for log in logs:
            sys.stderr.write(log[-4000:] + "\n====\n")
    return ok


def run_launcher(args):
    tmp = tempfile.mkdtemp(prefix="mh_dryrun_")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)

    def spawn(extra, out, port):
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--num_processes", str(args.num_processes),
             "--local_devices", str(args.local_devices),
             "--steps", str(args.steps), "--port", str(port),
             "--mode", args.mode, "--body", args.body, "--out", out] + extra,
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )

    if args.mode == "resume":
        return _launch_resume(args, tmp, spawn)
    if args.mode == "eval":
        return _launch_eval(args, tmp, spawn)

    port = args.port or _free_port()
    outs = [os.path.join(tmp, f"w{i}.json") for i in range(args.num_processes)]
    workers = [
        spawn(["--worker_id", str(i)], outs[i], port)
        for i in range(args.num_processes)
    ]
    single_out = os.path.join(tmp, "single.json")
    single = spawn(["--single"], single_out, port)

    if not _spawn_and_wait(workers + [single]):
        print(json.dumps({"ok": False, "error": "subprocess failed"}))
        return 1

    results = [json.load(open(o)) for o in outs]
    baseline = json.load(open(single_out))

    # 1. roidb shards disjoint + covering
    all_ids = sorted(i for r in results for i in r["shard_ids"])
    assert all_ids == list(range(N_ROIDB)), all_ids
    # 2. pmean'd losses identical across processes
    for s in range(args.steps):
        a = results[0]["metrics"][s]["total_loss"]
        for r in results[1:]:
            assert abs(r["metrics"][s]["total_loss"] - a) < 1e-6, (
                s, a, r["metrics"][s]["total_loss"]
            )
    # 3. multi-process == single-process on the same global batch
    deltas = []
    for s in range(args.steps):
        a = results[0]["metrics"][s]["total_loss"]
        b = baseline["metrics"][s]["total_loss"]
        deltas.append(abs(a - b))
        assert abs(a - b) < 1e-4 * max(1.0, abs(b)), (s, a, b)

    print(json.dumps({
        "ok": True,
        "body": args.body,
        "num_processes": args.num_processes,
        "devices": args.num_processes * args.local_devices,
        "steps": args.steps,
        "total_loss": results[0]["metrics"][-1]["total_loss"],
        "max_loss_delta_vs_single_process": max(deltas),
    }))
    return 0


def _launch_resume(args, tmp, spawn):
    """Segmented multi-process training: phase 1 runs `steps` steps and
    rank 0 saves; phase 2 RESTARTS all processes, every rank restores the
    rank-0 checkpoint and runs `steps` more. Post-resume losses must be
    identical across ranks and equal to an uninterrupted single-process
    run of 2*steps (VERDICT r3 item 5b)."""
    ckpt_dir = os.path.join(tmp, "ckpt")
    outs1 = [os.path.join(tmp, f"p1_w{i}.json") for i in range(args.num_processes)]
    port = _free_port()
    phase1 = [
        spawn(["--worker_id", str(i), "--phase", "save",
               "--ckpt_dir", ckpt_dir], outs1[i], port)
        for i in range(args.num_processes)
    ]
    single_out = os.path.join(tmp, "single.json")
    single = spawn(["--single"], single_out, port)
    if not _spawn_and_wait(phase1 + [single]):
        print(json.dumps({"ok": False, "error": "phase-1 subprocess failed"}))
        return 1

    outs2 = [os.path.join(tmp, f"p2_w{i}.json") for i in range(args.num_processes)]
    port2 = _free_port()  # fresh coordinator: genuinely restarted processes
    phase2 = [
        spawn(["--worker_id", str(i), "--phase", "restore",
               "--ckpt_dir", ckpt_dir, "--start_s", str(args.steps)],
              outs2[i], port2)
        for i in range(args.num_processes)
    ]
    if not _spawn_and_wait(phase2):
        print(json.dumps({"ok": False, "error": "phase-2 subprocess failed"}))
        return 1

    seg1 = [json.load(open(o)) for o in outs1]
    seg2 = [json.load(open(o)) for o in outs2]
    baseline = json.load(open(single_out))["metrics"]

    deltas = []
    for s in range(args.steps):
        # all ranks agree within each phase
        for seg, idx in ((seg1, s), (seg2, s)):
            a = seg[0]["metrics"][idx]["total_loss"]
            for r in seg[1:]:
                assert abs(r["metrics"][idx]["total_loss"] - a) < 1e-6, (
                    "rank divergence", idx, a, r["metrics"][idx]["total_loss"]
                )
        # segmented == uninterrupted at every step (incl. across the
        # save/restore boundary: params, momentum, step counter, LR)
        for got, want_idx in (
            (seg1[0]["metrics"][s]["total_loss"], s),
            (seg2[0]["metrics"][s]["total_loss"], args.steps + s),
        ):
            want = baseline[want_idx]["total_loss"]
            deltas.append(abs(got - want))
            assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (
                "resume mismatch", want_idx, got, want
            )

    print(json.dumps({
        "ok": True,
        "mode": "resume",
        "num_processes": args.num_processes,
        "devices": args.num_processes * args.local_devices,
        "steps_per_segment": args.steps,
        "post_resume_loss": seg2[0]["metrics"][-1]["total_loss"],
        "max_loss_delta_vs_uninterrupted": max(deltas),
    }))
    return 0


def _launch_eval(args, tmp, spawn):
    """Real multi-process EVAL: each jax.distributed process infers its
    parallel.eval_index_range shard; merged detections and metrics must
    equal a single-process full pass (VERDICT r3 item 5c)."""
    import pickle

    import numpy as np

    data_dir = os.path.join(tmp, "data")
    os.makedirs(data_dir)
    _write_eval_dataset(data_dir)

    port = _free_port()
    outs = [os.path.join(tmp, f"ew{i}.json") for i in range(args.num_processes)]
    workers = [
        spawn(["--worker_id", str(i), "--data_dir", data_dir], outs[i], port)
        for i in range(args.num_processes)
    ]
    single_out = os.path.join(tmp, "eval_single.json")
    single = spawn(["--single", "--data_dir", data_dir], single_out, port)
    if not _spawn_and_wait(workers + [single]):
        print(json.dumps({"ok": False, "error": "eval subprocess failed"}))
        return 1

    from cim_tpu.parallel import merge_sharded_results

    parts = []
    ranges = []
    for o in outs:
        with open(o + ".pkl", "rb") as f:
            parts.append(pickle.load(f))
        ranges.append(json.load(open(o))["ind_range"])
    with open(single_out + ".pkl", "rb") as f:
        full = pickle.load(f)

    # shards disjoint + covering
    covered = sorted(i for s, e in ranges for i in range(s, e))
    assert covered == list(range(EVAL_N_IMAGES)), ranges
    merged = merge_sharded_results(parts)
    assert set(merged) == set(full), (sorted(merged)[:3], sorted(full)[:3])
    max_delta = 0.0
    for k in full:
        d = float(np.max(np.abs(merged[k]["scores"] - full[k]["scores"])))
        max_delta = max(max_delta, d)
        assert d < 1e-5, (k, d)

    # metrics over merged detections == metrics over the full pass
    metrics = []
    for all_scores in (merged, full):
        m = _eval_metrics_from_scores(data_dir, all_scores, tmp)
        metrics.append(m)
    assert abs(metrics[0]["AP"] - metrics[1]["AP"]) < 1e-9, metrics

    print(json.dumps({
        "ok": True,
        "mode": "eval",
        "num_processes": args.num_processes,
        "images": EVAL_N_IMAGES,
        "shard_ranges": ranges,
        "max_score_delta": max_delta,
        "AP_merged": metrics[0]["AP"],
        "AP_single": metrics[1]["AP"],
    }))
    return 0


def _eval_metrics_from_scores(data_dir, all_scores, tmp):
    """COCO bbox metrics from an all_scores dict (the launcher-side tail
    of the eval: NMS post-processing + evaluate_all)."""
    _setup_jax(1)

    from cim_tpu.data import catalog
    from cim_tpu.data.json_dataset import JsonDataset
    from cim_tpu.engine.test_engine import get_roidb_and_dataset, post_process_results
    from cim_tpu.evaluation import task_evaluation

    catalog.register_dataset("mh_eval", {
        catalog.IM_DIR: data_dir,
        catalog.ANN_FN: os.path.join(data_dir, "ann.json"),
    })
    cfg = _make_cfg()
    cfg.TEST.DATASETS = ("mh_eval",)
    roidb, dataset, _, _, _ = get_roidb_and_dataset(
        cfg, "mh_eval", os.path.join(data_dir, "props.pkl"), None
    )
    all_boxes = post_process_results(cfg, all_scores, roidb, dataset)
    out_dir = os.path.join(tmp, "metrics_out")
    return task_evaluation.evaluate_all(dataset, all_boxes, out_dir)


def main():
    args = parse_args()
    if args.worker_id is not None:
        if args.mode == "eval":
            run_eval_worker(args)
        else:
            run_worker(args)
    elif args.single:
        if args.mode == "eval":
            run_eval_single(args)
        else:
            run_single(args)
    else:
        sys.exit(run_launcher(args))


if __name__ == "__main__":
    main()
