#!/usr/bin/env python
"""TTA inference throughput benchmark (one TPU chip).

Measures s/image of the FULL 10-pass VOC TTA protocol (hflip + 4 scales
x hflip + identity, configs/resnet50_voc.yaml:42-52) at production shape
(VOC-sized image, ~1900 COB proposals), sequential (reference-style
one-image-at-a-time; round-1 number 1.64 s/image) vs the cross-image
BatchedEvaluator. Prints one JSON line per mode.
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
    ap.add_argument("--n_images", type=int, default=8)
    ap.add_argument("--n_props", type=int, default=1900)
    ap.add_argument("--eval_batch", type=int, default=4)
    ap.add_argument("--modes", default="seq,batched")
    args = ap.parse_args()

    import jax

    from cim_tpu.config import clone_cfg, load_cfg
    from cim_tpu.engine.test import BatchedEvaluator, Evaluator
    from cim_tpu.engine.train import Trainer
    from cim_tpu.data.synthetic import make_microbatch

    cfg = clone_cfg(
        load_cfg(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "configs",
                "resnet50_voc.yaml",
            )
        )
    )
    cfg.TPU.DATA_PARALLEL = 1
    cfg.TPU.PALLAS_ROI_ALIGN = True
    cfg.TPU.REMAT_BOX_HEAD = False

    rng = np.random.RandomState(0)
    sample = make_microbatch(rng, image_hw=(128, 128), n_props=64, n_valid=64)
    saved = cfg.TPU.PROPOSAL_PAD
    cfg.TPU.PROPOSAL_PAD = 64
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)
    cfg.TPU.PROPOSAL_PAD = saved
    variables = {"params": trainer.state.params, "stats": trainer.stats}

    # VOC-typical 500x375 image, n_props proposals
    def make_item(seed):
        r = np.random.RandomState(seed)
        im = (r.rand(375, 500, 3) * 255).astype(np.uint8)
        n = args.n_props
        x1 = r.uniform(0, 250, n)
        y1 = r.uniform(0, 180, n)
        boxes = np.stack(
            [x1, y1, x1 + r.uniform(16, 249, n), y1 + r.uniform(16, 194, n)],
            -1,
        ).astype(np.float32)
        masks = (r.rand(n, 7, 7) > 0.5).astype(np.float32)
        return im, boxes, masks

    items = [make_item(i) for i in range(args.n_images)]
    modes = args.modes.split(",")

    # analytic model FLOPs of the full TTA protocol for one image: the
    # shared train FLOP model (fwd+bwd = 3x fwd) divided back to fwd-only,
    # summed over the 10 passes' canvas-dependent feature shapes
    from bench import TPU_PEAK_FLOPS, model_train_flops

    rh, rw = Evaluator._ratio_bucket(375, 500)
    flops = sum(
        model_train_flops(
            args.n_props,
            (-(-int(np.ceil(t * rh)) // 16), -(-int(np.ceil(t * rw)) // 16)),
            num_classes=cfg.MODEL.NUM_CLASSES,
            refine_times=cfg.REFINE_TIMES,
        ) / 3.0
        for t, _ in Evaluator.tta_pass_list(cfg)
    )
    peak = TPU_PEAK_FLOPS

    if "seq" in modes:
        ev = Evaluator(cfg, trainer.model, variables)
        ev.im_detect_all(*items[0])  # compile all buckets
        t0 = time.time()
        for it in items:
            ev.im_detect_all(*it)
        dt = (time.time() - t0) / len(items)
        print(
            json.dumps(
                {
                    "metric": "tta_eval_s_per_image_sequential",
                    "value": round(dt, 3),
                    "unit": "s/image",
                    "passes": 10,
                    "mfu_model": round(flops / dt / peak, 4),
                }
            ),
            flush=True,
        )

    if "batched" in modes:
        bev = BatchedEvaluator(cfg, trainer.model, variables, args.eval_batch)
        bev.im_detect_all_many(items[: args.eval_batch])  # compile
        t0 = time.time()
        bev.im_detect_all_many(items)
        dt = (time.time() - t0) / len(items)
        print(
            json.dumps(
                {
                    "metric": "tta_eval_s_per_image_batched",
                    "value": round(dt, 3),
                    "unit": "s/image",
                    "passes": 10,
                    "eval_batch": args.eval_batch,
                    "mfu_model": round(flops / dt / peak, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
