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
    return p.parse_args()


def _setup_jax(n_local_devices):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_local_devices)
    return jax


def _make_cfg():
    import cim_tpu.models.tiny  # noqa: F401  (registers tiny.conv_body)
    from cim_tpu.config import clone_cfg, get_default_cfg

    cfg = clone_cfg(get_default_cfg())
    cfg.MODEL.CONV_BODY = "tiny.conv_body"
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


def _run_steps(trainer, batch, steps):
    import jax

    out = []
    for s in range(steps):
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

    cfg = _make_cfg()
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

    cfg = _make_cfg()
    cfg.TPU.DATA_PARALLEL = n_total
    batch, sample = _global_batch_and_sample(n_total)
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)
    metrics = _run_steps(trainer, batch, args.steps)
    with open(args.out, "w") as f:
        json.dump({"metrics": metrics}, f)
    print(f"single done: {[m['total_loss'] for m in metrics]}", flush=True)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_launcher(args):
    tmp = tempfile.mkdtemp(prefix="mh_dryrun_")
    port = args.port or _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)

    def spawn(extra, out):
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--num_processes", str(args.num_processes),
             "--local_devices", str(args.local_devices),
             "--steps", str(args.steps), "--port", str(port),
             "--out", out] + extra,
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )

    outs = [os.path.join(tmp, f"w{i}.json") for i in range(args.num_processes)]
    workers = [
        spawn(["--worker_id", str(i)], outs[i])
        for i in range(args.num_processes)
    ]
    single_out = os.path.join(tmp, "single.json")
    single = spawn(["--single"], single_out)

    logs = []
    ok = True
    for proc in workers + [single]:
        log, _ = proc.communicate(timeout=1200)
        logs.append(log)
        ok &= proc.returncode == 0
    if not ok:
        for log in logs:
            sys.stderr.write(log[-4000:] + "\n====\n")
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
        "num_processes": args.num_processes,
        "devices": args.num_processes * args.local_devices,
        "steps": args.steps,
        "total_loss": results[0]["metrics"][-1]["total_loss"],
        "max_loss_delta_vs_single_process": max(deltas),
    }))
    return 0


def main():
    args = parse_args()
    if args.worker_id is not None:
        run_worker(args)
    elif args.single:
        run_single(args)
    else:
        sys.exit(run_launcher(args))


if __name__ == "__main__":
    main()
