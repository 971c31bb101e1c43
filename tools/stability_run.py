#!/usr/bin/env python
"""N-step training stability run at production shape on one TPU chip.

Repeats the README's stability experiment: the full resnet50_voc train
step (grad_accum 4) on synthetic data at the 2048-proposal bucket,
fresh synthetic batch every step, printing the smoothed losses. Passes
if every loss stays finite and total_loss decreases start -> end.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="configs/resnet50_voc.yaml")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--n_props", type=int, default=2000)
    ap.add_argument("--image_hw", type=int, nargs=2, default=(384, 512))
    ap.add_argument("--disp", type=int, default=10)
    ap.add_argument("--precision", default=None,
                    help="override cfg.TPU.PRECISION (f32 | bf16_compute) "
                    "for the precision-drift experiment")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json_out", default=None,
                    help="dump the full loss trajectory as JSON")
    ap.add_argument("--batch_pool", type=int, default=0,
                    help="pre-stage N distinct batches and cycle them "
                    "(host batch synthesis is ~10 s/batch on this rig's "
                    "single core — a fresh batch per step leaves the TPU "
                    "95%% idle); 0 = fresh batch every step")
    args = ap.parse_args()

    import jax

    from cim_tpu.config import clone_cfg, load_cfg
    from cim_tpu.data.loader import proposal_bucket
    from cim_tpu.data.synthetic import make_microbatch, make_train_batch
    from cim_tpu.engine.train import Trainer

    cfg_path = args.cfg
    if not os.path.isabs(cfg_path):
        cfg_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            cfg_path,
        )
    cfg = clone_cfg(load_cfg(cfg_path))
    cfg.TPU.DATA_PARALLEL = 1
    cfg.TPU.PALLAS_ROI_ALIGN = True
    cfg.TPU.REMAT_BOX_HEAD = False
    if args.precision is not None:
        cfg.TPU.PRECISION = args.precision
    accum = cfg.TPU.GRAD_ACCUM

    rng = np.random.RandomState(args.seed)
    kw = dict(
        image_hw=tuple(args.image_hw),
        n_props=proposal_bucket(cfg, args.n_props),
        n_valid=args.n_props,
        num_classes=cfg.MODEL.NUM_CLASSES,
    )
    sample = make_microbatch(rng, **kw)
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)

    pool = None
    if args.batch_pool:
        import jax.numpy as jnp

        pool = [
            jax.device_put(
                jax.tree.map(jnp.asarray, make_train_batch(rng, 1, accum, **kw))
            )
            for _ in range(args.batch_pool)
        ]

    first = last = None
    history = []
    t0 = time.time()
    t_steady = None  # set after step 0: excludes the first-step compile
    for i in range(args.steps):
        batch = pool[i % len(pool)] if pool else make_train_batch(rng, 1, accum, **kw)
        m = trainer.step(batch, jax.random.PRNGKey(100 + i))
        total = float(m["total_loss"])
        history.append(
            {k: float(v) for k, v in m.items() if k.endswith("loss")}
        )
        assert np.isfinite(total), f"step {i}: non-finite total_loss"
        if first is None:
            first = total
        last = total
        if i == 0:
            t_steady = time.time()
        if i % args.disp == 0 or i == args.steps - 1:
            parts = " ".join(
                f"{k}={float(v):.4f}"
                for k, v in sorted(m.items())
                if k.endswith("loss")
            )
            print(f"step {i:4d} {parts}", flush=True)
    dt = time.time() - t0
    steady = time.time() - t_steady
    steady_ips = (args.steps - 1) * accum / steady if args.steps > 1 else 0.0
    print(
        f"stability OK: {args.steps} steps, total_loss {first:.4f} -> "
        f"{last:.4f}, {steady_ips:.2f} img/s steady-state "
        f"({args.steps * accum / dt:.2f} incl. first-step compile; host "
        f"batch synthesis + per-step metric fetches included)",
        flush=True,
    )
    if args.json_out:
        import json

        with open(args.json_out, "w") as f:
            json.dump({"precision": cfg.TPU.PRECISION, "steps": args.steps,
                       "history": history}, f)
    # fresh random batches + linear warmup: the decrease is only
    # resolvable above the step-to-step noise on longer runs
    if args.steps >= 40:
        assert last < first, "total_loss did not decrease"


if __name__ == "__main__":
    main()
