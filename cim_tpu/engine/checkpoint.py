"""Checkpointing via orbax (reference: tools/train.py save_ckpt :126-142,
load/resume :313-336; lib/utils/net.py load_ckpt non-strict :140-150).

Layout: <output_dir>/ckpt/<step>/ with {params, opt_state(momentum+prev_lr),
stats, step}. The crash-save behavior of the reference train loop
(tools/train.py:450-456) is reproduced by Trainer loops calling
save() from their except block.
"""
from __future__ import annotations

import logging
import os
from typing import Any


import numpy as np
import orbax.checkpoint as ocp

from cim_tpu.engine.train import TrainState

logger = logging.getLogger(__name__)


def _manager(ckpt_dir: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    import jax

    # Scope orbax's internal barriers to THIS process. The checkpoint
    # protocol here is rank-0-only save + independent per-rank restore of
    # host numpy arrays (reference tools/train.py rank gating); orbax's
    # default under jax.distributed is a collective save whose
    # sync_global_processes waits on every rank — a rank-0-only call then
    # deadlocks at a gloo barrier (caught by the resume-mode
    # multihost_dryrun). A singleton active_processes set makes every
    # orbax sync a no-op while keeping the on-disk layout identical.
    kw = {"create": True}
    if jax.process_count() > 1:
        pi = jax.process_index()
        kw["multiprocessing_options"] = ocp.options.MultiprocessingOptions(
            primary_host=pi,
            active_processes={pi},
            barrier_sync_key_prefix=f"rank{pi}",
        )
        # orbax rejects create=True together with active_processes
        kw["create"] = False
        os.makedirs(os.path.abspath(ckpt_dir), exist_ok=True)
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, **kw),
    )


def save_ckpt(ckpt_dir: str, state: TrainState, stats: Any, extra: dict | None = None):
    import jax

    payload = {
        "params": state.params,
        # optimizer state as a plain dict: works for SGDState and AdamState
        "opt_state": dict(state.opt_state._asdict()),
        "stats": stats,
        "extra": extra or {},
    }
    # Fetch to host numpy before handing to orbax: under multi-process
    # (jax.distributed) only rank 0 saves (tools/train.py), and orbax's
    # global-array path would wait on the other processes; dp-replicated
    # arrays are fully addressable on every host, so the local copy IS
    # the global value. No-op cost single-process.
    payload = jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, payload
    )
    mgr = _manager(ckpt_dir)
    mgr.save(int(state.step), args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def wait_for_checkpoint(
    ckpt_dir: str, poll_s: float = 10.0, timeout_s: float | None = None
) -> int:
    """Block until a checkpoint appears in ckpt_dir; returns its step.

    Lets eval be launched before training has written its first snapshot
    (reference tools/test_net.py:156-163 busy-waits on the ckpt path).
    Raises TimeoutError after timeout_s (None = wait forever).
    """
    import time

    t0 = time.monotonic()
    while True:
        step = latest_step(ckpt_dir)
        if step is not None:
            return step
        if timeout_s is not None and time.monotonic() - t0 > timeout_s:
            raise TimeoutError(f"No checkpoint appeared in {ckpt_dir}")
        logger.info("Waiting for checkpoint in %s ...", ckpt_dir)
        time.sleep(poll_s)


def load_ckpt(ckpt_dir: str, state: TrainState, stats: Any, step: int | None = None):
    """Restore (state, stats). Non-strict on params like the reference
    (missing keys keep their init values)."""
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"No checkpoint in {ckpt_dir}")
    template = {
        "params": state.params,
        "opt_state": dict(state.opt_state._asdict()),
        "stats": stats,
        "extra": {},
    }
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    opt_state = type(state.opt_state)(**restored["opt_state"])
    # The snapshot label is state.step AT SAVE TIME = the number of
    # completed steps = the index of the NEXT step to run (lr_schedule is
    # evaluated at state.step before the increment, engine/train.py).
    # Restoring exactly `step` therefore resumes at the first un-run step
    # — the reference's "resume at ckpt.step+1" (tools/train.py:328)
    # expressed in this counter: its ckpt.step is the last COMPLETED
    # index, ours is already one past it. A former `step + 1` here
    # silently skipped one step (and one LR-schedule point) per resume
    # segment; caught by the multi-process resume-parity dryrun.
    new_state = TrainState(
        params=restored["params"],
        opt_state=opt_state,
        step=np.asarray(step, np.int32),
    )
    return new_state, restored["stats"]
