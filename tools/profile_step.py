"""Train-step time breakdown at production shape on the attached device.

Prints steady-state timings for: model forward alone, the 3-branch CIM
mining stack alone, fwd+mining+losses, grad, and the full accumulated
train step (per-image). Use to attribute step-time regressions; the
numbers in README.md's performance table come from bench.py (same
shapes), this script explains them.

These are pipelined-loop timings — valid for device-bound programs
(tens of ms). For sub-RTT programs the tunnel's async dispatch makes
them meaningless; use tools/device_time.py (in-program chaining) there.

Reference has no equivalent (it publishes no throughput numbers at all;
SURVEY.md §6) — this is framework-native observability.
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cim_tpu.config import clone_cfg, load_cfg  # noqa: E402
from cim_tpu.data.loader import proposal_bucket  # noqa: E402
from cim_tpu.data.synthetic import make_microbatch, make_train_batch  # noqa: E402
from cim_tpu.engine.train import Trainer, mining_params_for_branch  # noqa: E402
from cim_tpu.mining.cim import cim_layer  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="configs/resnet50_voc.yaml")
    ap.add_argument("--n_valid", type=int, default=2000)
    ap.add_argument("--image_hw", type=int, nargs=2, default=(384, 512))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--set", dest="set_cfgs", nargs="+", default=None,
        help="cfg KEY VALUE pairs (cfg_from_list), applied after the yaml",
    )
    args = ap.parse_args()

    cfg = clone_cfg(load_cfg(args.cfg))
    if args.set_cfgs:
        from cim_tpu.config import cfg_from_list

        cfg_from_list(cfg, args.set_cfgs)
    cfg.TPU.DATA_PARALLEL = 1
    cfg.TPU.PALLAS_ROI_ALIGN = jax.default_backend() != "cpu"
    cfg.TPU.REMAT_BOX_HEAD = False

    n_pad = proposal_bucket(cfg, args.n_valid)
    rng = np.random.RandomState(0)
    kw = dict(
        image_hw=tuple(args.image_hw),
        n_props=n_pad,
        n_valid=args.n_valid,
        num_classes=cfg.MODEL.NUM_CLASSES,
    )
    mb = make_microbatch(rng, **kw)
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=mb)
    model, stats, loss_fn = trainer.model, trainer.stats, trainer.loss_fn
    params = jax.device_put(trainer.state.params)
    mb_j = jax.device_put({k: jnp.asarray(v) for k, v in mb.items()})

    def timeit(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        print(f"{name:30s} {(time.time() - t0) / args.iters * 1000:8.1f} ms",
              flush=True)

    fwd = jax.jit(
        lambda p, b: model.apply(
            {"params": p, "stats": stats},
            b["image"], b["rois"], b["masks"], b["valid"],
        )
    )
    timeit("forward (model only)",
           jax.jit(lambda p, b: fwd(p, b)["predict_cls"].sum()), params, mb_j)

    out0 = jax.device_put(jax.tree.map(jnp.asarray, fwd(params, mb_j)))

    def mine3(out, b):
        tot = jnp.zeros(())
        for k in range(cfg.REFINE_TIMES):
            pk = mining_params_for_branch(cfg, k)
            src_cls = out["predict_cls"] if k == 0 else out["refine_cls"][k - 1]
            src_det = out["predict_det"] if k == 0 else out["refine_iou"][k - 1]
            ps = cim_layer(
                src_cls, src_det, b["labels"].astype(jnp.float32),
                b["iou_map"].astype(jnp.float32),
                b["asy_iou_map"].astype(jnp.float32),
                b["valid"], pk, jax.random.PRNGKey(k), using_cim=True,
            )
            tot = tot + ps.pseudo_iou_labels.sum()
        return tot

    timeit("mining x3 (cim_layer)", jax.jit(mine3), out0, mb_j)
    timeit("loss_fn (fwd+mine+losses)",
           jax.jit(lambda p, b: loss_fn(p, b, jax.random.PRNGKey(0))[0]),
           params, mb_j)
    timeit(
        "grad(loss_fn)",
        jax.jit(lambda p, b: jax.grad(
            lambda pp: loss_fn(pp, b, jax.random.PRNGKey(0))[0])(p)),
        params, mb_j,
    )

    accum = cfg.TPU.GRAD_ACCUM
    batch = jax.device_put(
        jax.tree.map(jnp.asarray, make_train_batch(rng, 1, accum, **kw))
    )
    m = trainer.step(batch, jax.random.PRNGKey(0))
    jax.block_until_ready(m)
    t0 = time.time()
    reps = max(args.iters // 2, 1)
    for i in range(reps):
        m = trainer.step(batch, jax.random.PRNGKey(i))
    jax.block_until_ready(m)
    print(f"{'full step / image':30s} "
          f"{(time.time() - t0) / reps / accum * 1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
