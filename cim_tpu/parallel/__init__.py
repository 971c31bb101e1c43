"""Parallelism utilities: device meshes and sharded evaluation.

The reference's distributed story (SURVEY.md §2.3) is single-process
DataParallel over torch.cuda.comm (lib/nn/parallel/*) for training and
OS-subprocess index-range fan-out for inference
(lib/core/test_engine.py:204-244 + lib/utils/subprocess.py). Here both
collapse into jax.sharding:

- training: one shard_map over a Mesh data axis (cim_tpu.engine.train);
  gradients pmean over ICI — no NCCL bindings, no replicate/scatter;
- inference: index-range sharding over jax processes (multi-host) or
  local devices, results merged in memory — no pickled range files.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def data_parallel_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over local devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), axis_names=("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for (n_devices, ...) batches."""
    return NamedSharding(mesh, PartitionSpec("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def eval_index_range(num_items: int, process_index: int | None = None,
                     process_count: int | None = None):
    """Split [0, num_items) across processes (the reference's --range
    start end subprocess contract, lib/utils/subprocess.py:41-145)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    start = pi * num_items // pc
    end = (pi + 1) * num_items // pc
    return start, end


def merge_sharded_results(results_per_shard: list) -> dict:
    """Merge per-shard {image -> record} dicts (the reference merges
    pickled range files, test_engine.py:174-186)."""
    merged = {}
    for shard in results_per_shard:
        merged.update(shard)
    return merged


# ---------------------------- multi-host ------------------------------- #
# The reference is strictly single-host (SURVEY §2.3: DataParallel over
# torch.cuda.comm). Multi-host data parallelism here is the natural SPMD
# extension: jax.distributed.initialize() on every host, ONE global mesh
# over all processes' devices, each host feeding only its addressable
# "dp" rows (assembled into global arrays below). Gradients pmean over
# the same axis — ICI within a slice, DCN across slices — with no
# code change in the train step.


def global_data_parallel_mesh() -> Mesh:
    """1-D data-parallel mesh over ALL processes' devices. Call
    jax.distributed.initialize() on every host before any backend use."""
    return Mesh(np.array(jax.devices()), axis_names=("dp",))


def is_multiprocess(mesh: Mesh) -> bool:
    pi = jax.process_index()
    return any(d.process_index != pi for d in mesh.devices.flat)


def local_device_count(mesh: Mesh) -> int:
    """Rows of the global (dp, accum, ...) batch this process must feed."""
    pi = jax.process_index()
    return sum(d.process_index == pi for d in mesh.devices.flat)


def host_shard_roidb(roidb, process_index: int | None = None,
                     process_count: int | None = None):
    """Disjoint per-host roidb shard (strided, preserving the aspect
    grouping of roidb.rank_for_training). Each host's loader permutes and
    buckets only its own shard — the multi-host analog of the reference's
    per-GPU minibatch lists (lib/nn/parallel/data_parallel.py:78-87)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return roidb[pi::pc]


def replicate_tree(mesh: Mesh, tree):
    """Host (numpy) tree -> fully-replicated global arrays over `mesh`.

    Needed when restoring a checkpoint under jax.distributed: every rank
    reads the same host numpy values (engine/checkpoint.py restores
    host-side), and a jitted step over the global mesh rejects
    single-device-committed inputs. Identity on a single-process mesh
    (jit replicates host arrays itself)."""
    if not is_multiprocess(mesh):
        return tree
    sh = replicated(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree,
    )


def global_batch(mesh: Mesh, local_batch):
    """Assemble this host's (local_devices, accum, ...) numpy batch into
    global jax.Arrays sharded (dp, ...) over `mesh`. Identity on a
    single-process mesh."""
    if not is_multiprocess(mesh):
        return local_batch
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch,
    )
