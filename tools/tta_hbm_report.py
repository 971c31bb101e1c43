#!/usr/bin/env python
"""HBM breakdown of the fused 10-pass TTA program vs eval batch size.

Round-3 README records that eval_batch=16 exceeds the 15.75 GB v5e HBM at
the top TTA scale while 8 is the sweet spot; this tool turns that note
into a measured artifact: for each requested batch size it AOT-compiles
the BatchedEvaluator's fused all-passes program at the worst-case shape
(largest TTA target x square ratio bucket, production proposal pad) and
prints XLA's own memory analysis (argument/output/temp/peak bytes) plus,
when the batch fits, a measured step time. No training analog: the
reference streams one image at a time (lib/core/test.py:38-107) and has
no equivalent knob.

Usage (TPU): python tools/tta_hbm_report.py --batches 4,8,16
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4,8,16")
    ap.add_argument("--n_props", type=int, default=2048)
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--ratio", type=float, default=1.0,
                    help="ratio bucket (1.0 = square, worst case)")
    ap.add_argument("--measure", action="store_true",
                    help="also run + time each batch that compiles")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cim_tpu.config import clone_cfg, load_cfg
    from cim_tpu.data.synthetic import make_microbatch
    from cim_tpu.engine.test import BatchedEvaluator
    from cim_tpu.engine.train import Trainer

    cfg = clone_cfg(load_cfg(
        args.cfg or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs", "resnet50_voc.yaml",
        )
    ))
    cfg.TPU.DATA_PARALLEL = 1
    cfg.TPU.PALLAS_ROI_ALIGN = jax.default_backend() not in ("cpu",)
    cfg.TPU.REMAT_BOX_HEAD = False
    cfg.TPU.PROPOSAL_PAD = args.n_props

    rng = np.random.RandomState(0)
    sample = make_microbatch(
        rng, image_hw=(512, 512), n_props=args.n_props, n_valid=1900,
        num_classes=cfg.MODEL.NUM_CLASSES,
    )
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)
    variables = {"params": trainer.state.params, "stats": trainer.stats}

    # worst-case original-image bucket for the on-device resize source:
    # a square image at TEST.SCALE (the fused program ships the ORIGINAL
    # uint8 bucket; pass canvases are derived from the TTA targets)
    im_side = 640
    ratio_hw = (args.ratio, args.ratio)

    results = {}
    for b in [int(x) for x in args.batches.split(",")]:
        ev = BatchedEvaluator(cfg, trainer.model, variables, batch_size=b)
        fn = ev._fused_batched_jit(ratio_hw)
        image = jnp.zeros((b, im_side, im_side, 3), jnp.uint8)
        rois = jnp.asarray(rng.rand(b, args.n_props, 4) * 400, jnp.float32)
        masks = jnp.asarray(
            rng.rand(b, args.n_props, 7, 7) > 0.5, jnp.float32
        )
        valid = jnp.ones((b, args.n_props), bool)
        im_h = jnp.full((b,), im_side, jnp.int32)
        im_w = jnp.full((b,), im_side, jnp.int32)
        argvals = (variables, image, rois, masks, valid, im_h, im_w)
        rec = {"eval_batch": b}
        try:
            compiled = fn.lower(*argvals).compile()
            ma = compiled.memory_analysis()
            if ma is not None:
                rec.update({
                    "argument_gb": round(ma.argument_size_in_bytes / 2**30, 3),
                    "output_gb": round(ma.output_size_in_bytes / 2**30, 3),
                    "temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
                    "peak_gb": round(ma.peak_memory_in_bytes / 2**30, 3),
                    "args_plus_temp_gb": round(
                        (ma.argument_size_in_bytes + ma.output_size_in_bytes
                         + ma.temp_size_in_bytes) / 2**30, 3),
                })
            if args.measure:
                out = compiled(*argvals)
                np.asarray(out)  # true sync through the tunnel
                t0 = time.time()
                out = compiled(*argvals)
                np.asarray(out)
                dt = time.time() - t0
                rec["s_per_image"] = round(dt / b, 3)
            rec["ok"] = True
        except Exception as e:
            rec["ok"] = False
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        results[b] = rec
        print(json.dumps(rec), flush=True)

    print(json.dumps({
        "metric": "tta_fused_hbm_report",
        "n_props": args.n_props,
        "ratio_bucket": args.ratio,
        "hbm_limit_gb": 15.75,
        "per_batch": results,
    }), flush=True)


if __name__ == "__main__":
    main()
