"""Training engine: loss assembly + pjit/shard_map data-parallel train step.

Replaces the reference's training stack (tools/train.py:156-460 +
mynn.DataParallel, lib/nn/parallel/data_parallel.py):

- loss assembly follows Generalized_RCNN.forward exactly
  (lib/modeling/model_builder.py:161-207): K CIM branches feeding
  cls/iou/bag losses (branch 0 is weighted lmda=3, iou x3), plus the MIL
  bag loss and the PCL loss;
- gradient accumulation: the reference's iter_size inner loop with
  loss.backward per microbatch (tools/train.py:420-437) becomes a
  lax.scan over the microbatch axis summing gradients (losses are *not*
  divided by iter_size, matching the reference);
- multi-device: instead of DataParallel replicate/scatter/gather over
  NCCL, one shard_map over a jax.sharding.Mesh data axis; per-microbatch
  gradients are psum-averaged over 'dp' (the reference's per-GPU loss
  mean, training_stats.py:75-99) and parameters update replicated.
"""
from __future__ import annotations


from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from cim_tpu.engine.optimizer import build_masks, lr_schedule, make_optimizer
from cim_tpu.mining.cim import MiningParams, cim_layer
from cim_tpu.mining.losses import cls_iou_loss, mil_bag_loss, pcl_loss
from cim_tpu.models.builder import build_model, frozen_paths_for


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar


def mining_params_for_branch(cfg, k: int) -> MiningParams:
    """Threshold ramp per refine branch (reference model_builder.py:90-94)."""
    return MiningParams(
        p_seed=cfg.p_seed,
        cls_thr=0.25 + cfg.step_rate * k,
        iou_thr=0.5 + cfg.step_rate * k,
        con_thr=cfg.adj_thr,
        anti_noise=cfg.Anti_noise_sampling,
        class_budget=int(cfg.TPU.MINING_CLASS_BUDGET),
    )


def compute_losses(cfg, out, batch, rng) -> Dict[str, jax.Array]:
    """Assemble the four training losses for one image.

    batch: image/rois/masks/valid/labels/mat/iou_map/asy_iou_map.
    """
    labels = batch["labels"].astype(jnp.float32)
    valid = batch["valid"]
    iou_map = batch["iou_map"].astype(jnp.float32)
    asy_iou_map = batch["asy_iou_map"].astype(jnp.float32)

    predict_cls = out["predict_cls"]
    predict_det = out["predict_det"]
    refine_cls = out["refine_cls"]
    refine_iou = out["refine_iou"]

    losses = {
        "bag_loss": mil_bag_loss(predict_cls, predict_det, labels, valid),
        "pcl_loss": pcl_loss(
            predict_cls, batch["mat"], labels, valid,
            max_clusters=cfg.TPU.MAX_CLUSTERS,
        ),
        "cls_loss": jnp.zeros((), jnp.float32),
        "iou_loss": jnp.zeros((), jnp.float32),
    }

    for k in range(cfg.REFINE_TIMES):
        params_k = mining_params_for_branch(cfg, k)
        if k == 0:
            src_cls, src_det = predict_cls, predict_det
        else:
            src_cls, src_det = refine_cls[k - 1], refine_iou[k - 1]
        key_k = jax.random.fold_in(rng, k)
        pseudo = cim_layer(
            jax.lax.stop_gradient(src_cls),
            jax.lax.stop_gradient(src_det),
            labels,
            iou_map,
            asy_iou_map,
            valid,
            params_k,
            key_k,
            using_cim=True,
        )
        lmda = 3.0 if k == 0 else 1.0
        pl = jax.lax.stop_gradient(pseudo.pseudo_labels)
        pil = jax.lax.stop_gradient(pseudo.pseudo_iou_labels)
        lw = lmda * jax.lax.stop_gradient(pseudo.loss_weights)
        c_l, i_l, b_l = cls_iou_loss(
            refine_cls[k], refine_iou[k], pl, pil, lw, labels, valid
        )
        gate = pseudo.has_gt.astype(jnp.float32)
        losses["cls_loss"] = losses["cls_loss"] + gate * c_l
        losses["iou_loss"] = losses["iou_loss"] + gate * 3.0 * i_l
        losses["bag_loss"] = losses["bag_loss"] + gate * b_l

        # mining health metrics (no reference counterpart — its convergence
        # failures surface here first): mined-GT count, fg fraction of the
        # valid proposals, branch-found-anything rate
        n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        fg = jnp.sum(pl[:, 1:]) / n_valid
        losses[f"mined_gt_{k}"] = pseudo.gt_count.astype(jnp.float32)
        losses[f"fg_frac_{k}"] = fg
        losses[f"has_gt_{k}"] = gate

    return losses


def make_loss_fn(cfg, model, stats):
    def loss_fn(params, batch, rng):
        im_hw = batch.get("image_hw")  # (2,) true extent of a padded bucket
        out = model.apply(
            {"params": params, "stats": stats},
            batch["image"],
            batch["rois"],
            batch["masks"],
            batch["valid"],
            im_hw=None if im_hw is None else (im_hw[0], im_hw[1]),
        )
        losses = compute_losses(cfg, out, batch, rng)
        # only the four losses sum into the objective; mined_gt_/fg_frac_/
        # has_gt_ entries are observability metrics
        total = (
            losses["bag_loss"] + losses["pcl_loss"]
            + losses["cls_loss"] + losses["iou_loss"]
        )
        losses["total_loss"] = total
        return total, losses

    return loss_fn


def get_mesh(cfg) -> Mesh:
    n = cfg.TPU.DATA_PARALLEL or len(jax.devices())
    devices = np.array(jax.devices()[:n])
    return Mesh(devices, axis_names=("dp",))


class Trainer:
    """Owns model/params/optimizer and the compiled data-parallel step.

    Batch layout fed to `step`: each array leaf has leading dims
    (n_devices, grad_accum, ...) — one microbatch per device per inner
    iteration, exactly the reference's NUM_GPUS x iter_size grid.
    """

    def __init__(self, cfg, rng_key, mesh: Mesh | None = None, sample_batch=None):
        from cim_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache()
        self.cfg = cfg
        self.model = build_model(cfg)
        self.mesh = mesh if mesh is not None else get_mesh(cfg)

        if sample_batch is None:
            raise ValueError("sample_batch (one microbatch) required for init")
        # jitted init: eager flax init dispatches thousands of tiny ops
        variables = jax.jit(self.model.init)(
            rng_key,
            sample_batch["image"],
            sample_batch["rois"],
            sample_batch["masks"],
            sample_batch["valid"],
        )
        self.stats = variables.get("stats", {})
        params = variables["params"]

        trainable, bias = build_masks(
            params, frozen_paths_for(cfg), cfg.TRAIN.FREEZE_CONV_BODY
        )
        self.opt_init, self.opt_update = make_optimizer(cfg, trainable, bias)
        self.state = TrainState(
            params=params,
            opt_state=self.opt_init(params),
            step=jnp.zeros((), jnp.int32),
        )
        self.loss_fn = make_loss_fn(cfg, self.model, self.stats)
        # multi-host: the mesh spans other processes' devices; step()
        # assembles each host's local batch rows into global arrays
        from cim_tpu import parallel

        self._multiprocess = parallel.is_multiprocess(self.mesh)
        self._step = self._build_step()

    def set_state(self, state: "TrainState"):
        """Install an externally-built state (checkpoint restore). Under
        jax.distributed the restored host arrays must become
        fully-replicated GLOBAL arrays before the mesh-spanning jitted
        step accepts them (caught by the resume-mode multihost_dryrun:
        'Received incompatible devices')."""
        from cim_tpu import parallel

        self.state = TrainState(*parallel.replicate_tree(self.mesh, tuple(state)))

    def set_stats(self, stats):
        """Replace the frozen-BN stats AND rebuild the compiled step.

        loss_fn/_step close over the stats tree at construction; assigning
        `trainer.stats` alone would leave the jitted step computing with
        the init-time stats (mean 0 / var 1) while checkpoints save the
        new ones — use this whenever loading external weights."""
        self.stats = jax.tree.map(jnp.asarray, stats)
        self.loss_fn = make_loss_fn(self.cfg, self.model, self.stats)
        self._step = self._build_step()

    # ------------------------------------------------------------------ #
    def _build_step(self):
        cfg = self.cfg
        loss_fn = self.loss_fn
        opt_update = self.opt_update
        mesh = self.mesh

        single_device = mesh.size == 1

        def device_step(state: TrainState, batch, rng):
            """Runs on each device's shard: batch leaves (1, accum, ...)."""
            batch = jax.tree.map(lambda x: x[0], batch)  # drop device dim
            dp_idx = 0 if single_device else jax.lax.axis_index("dp")
            rng = jax.random.fold_in(rng, dp_idx)
            rng = jax.random.fold_in(rng, state.step)

            def micro(carry, mb_rng):
                grads_acc, loss_acc = carry
                mb, key = mb_rng
                grads, losses = jax.grad(loss_fn, has_aux=True)(
                    state.params, mb, key
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                loss_acc = jax.tree.map(jnp.add, loss_acc, losses)
                return (grads_acc, loss_acc), None

            accum = jax.tree.leaves(batch)[0].shape[0]
            keys = jax.random.split(rng, accum)
            # varying zero: scan carries must inherit the batch's vma
            vz = jnp.sum(batch["labels"]) * 0.0
            zeros_g = jax.tree.map(lambda p: jnp.zeros_like(p) + vz, state.params)
            metric_keys = ["bag_loss", "pcl_loss", "cls_loss", "iou_loss",
                           "total_loss"]
            for k in range(cfg.REFINE_TIMES):
                metric_keys += [f"mined_gt_{k}", f"fg_frac_{k}", f"has_gt_{k}"]
            zeros_l = {k: jnp.zeros(()) + vz for k in metric_keys}
            (grads, losses), _ = jax.lax.scan(
                micro, (zeros_g, zeros_l), (batch, keys)
            )
            # reference: per-inner-iter mean over GPUs, summed over iter_size
            if not single_device:
                grads = jax.lax.pmean(grads, "dp")
                losses = jax.lax.pmean(losses, "dp")
            # log the per-microbatch mean (training_stats _mean_and_reset)
            losses = jax.tree.map(lambda x: x / accum, losses)

            lr = lr_schedule(cfg, state.step)
            new_params, new_opt = opt_update(
                grads, state.opt_state, state.params, lr
            )
            new_state = TrainState(new_params, new_opt, state.step + 1)
            metrics = dict(losses)
            metrics["lr"] = lr
            return new_state, metrics

        if single_device:
            # no sharding needed; also sidesteps a jax lowering issue with
            # pallas_call + custom_vjp closed_calls under shard_map
            return jax.jit(device_step, donate_argnums=(0,))

        from jax import shard_map

        sharded = shard_map(
            device_step,
            mesh=mesh,
            in_specs=(P(), P("dp"), P()),
            out_specs=(P(), P()),
            # pallas_call outputs carry no vma annotation; skip the check
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0,))

    # ------------------------------------------------------------------ #
    def step(self, batch, rng):
        """batch leaves: (n_devices, grad_accum, ...) — local devices on a
        multi-host mesh (see parallel.global_batch); rng must be identical
        on every host (derive it from the step counter)."""
        if self._multiprocess:
            from cim_tpu import parallel

            batch = parallel.global_batch(self.mesh, batch)
        self.state, metrics = self._step(self.state, batch, rng)
        return metrics
