"""Multi-host data-parallel plumbing (single-process checkable parts).

The multi-host design (cim_tpu/parallel): one global Mesh over all
processes' devices, each host feeds its addressable dp rows
(global_batch), trains on a disjoint roidb shard (host_shard_roidb).
With process_count == 1 every helper must degrade to the single-host
behavior the rest of the suite pins.
"""
import jax
import pytest
import numpy as np

from cim_tpu import parallel


def test_host_shard_roidb_disjoint_and_covering():
    roidb = [{"id": i} for i in range(11)]
    shards = [parallel.host_shard_roidb(roidb, pi, 4) for pi in range(4)]
    ids = [e["id"] for s in shards for e in s]
    assert sorted(ids) == list(range(11))
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1


def test_host_shard_roidb_single_process_identity():
    roidb = [{"id": i} for i in range(5)]
    assert parallel.host_shard_roidb(roidb, 0, 1) == roidb


def test_global_batch_identity_on_single_process_mesh():
    mesh = parallel.data_parallel_mesh()
    assert not parallel.is_multiprocess(mesh)
    assert parallel.local_device_count(mesh) == mesh.size
    batch = {"x": np.arange(mesh.size * 2, dtype=np.float32).reshape(mesh.size, 2)}
    out = parallel.global_batch(mesh, batch)
    assert out is batch  # identity, no copies


def test_replicate_tree_identity_on_single_process_mesh():
    mesh = parallel.data_parallel_mesh()
    tree = {"a": np.ones((2, 3), np.float32), "b": np.int32(7)}
    out = parallel.replicate_tree(mesh, tree)
    assert out is tree  # identity, jit replicates host arrays itself


def test_trainer_detects_single_process_mesh():
    import cim_tpu.models.tiny  # noqa: F401
    from cim_tpu.config import clone_cfg, get_default_cfg
    from cim_tpu.data.synthetic import make_microbatch
    from cim_tpu.engine.train import Trainer

    cfg = clone_cfg(get_default_cfg())
    cfg.MODEL.CONV_BODY = "tiny.conv_body"
    cfg.TPU.PROPOSAL_PAD = 32
    cfg.TPU.GRAD_ACCUM = 1
    cfg.TPU.DATA_PARALLEL = 2
    cfg.TPU.PRECISION = "f32"
    rng = np.random.RandomState(0)
    sample = make_microbatch(rng, image_hw=(32, 32), n_props=32, n_valid=16)
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)
    assert trainer._multiprocess is False


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    """REAL multi-process execution: the launcher spawns 2 jax.distributed
    CPU processes (localhost coordinator, gloo collectives) + a
    single-process baseline over the same 8-device global batch and
    asserts identical losses and a disjoint+covering roidb sharding.
    See tools/multihost_dryrun.py."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "tools/multihost_dryrun.py"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1100,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["ok"]
    assert result["num_processes"] == 2
    assert result["max_loss_delta_vs_single_process"] < 1e-4


def _run_dryrun_mode(mode, extra=()):
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "tools/multihost_dryrun.py", "--mode", mode,
         *extra],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1100,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_two_process_checkpoint_resume_parity():
    """Rank-0 orbax save -> full process restart -> ALL ranks restore ->
    post-resume losses equal an uninterrupted single-process run
    (VERDICT r3 item 5b). This path caught a real deadlock (orbax's
    collective sync on a rank-0-only save) and a restore bug (host
    arrays not re-replicated over the global mesh)."""
    result = _run_dryrun_mode(
        "resume", ("--num_processes", "2", "--local_devices", "1",
                   "--steps", "2"),
    )
    assert result["ok"] and result["mode"] == "resume"
    assert result["max_loss_delta_vs_uninterrupted"] < 1e-5


@pytest.mark.slow
def test_two_process_sharded_eval_matches_single():
    """Real 2-process EVAL: each jax.distributed process infers its
    parallel.eval_index_range roidb shard; merged detections must equal
    a single-process full pass bitwise, with identical COCO metrics
    (the reference's subprocess --range fan-out contract,
    lib/utils/subprocess.py:41-145, via jax process identity)."""
    result = _run_dryrun_mode(
        "eval", ("--num_processes", "2", "--local_devices", "1"),
    )
    assert result["ok"] and result["mode"] == "eval"
    assert result["max_score_delta"] == 0.0
    assert result["AP_merged"] == result["AP_single"]
