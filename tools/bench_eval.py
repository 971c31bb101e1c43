#!/usr/bin/env python
"""TTA inference throughput benchmark (one TPU chip).

Measures s/image of the FULL 10-pass VOC TTA protocol (hflip + 4 scales
x hflip + identity, configs/resnet50_voc.yaml:42-52) at production shape
(VOC-sized image, ~1900 COB proposals), sequential (reference-style
one-image-at-a-time; round-1 number 1.64 s/image) vs the cross-image
BatchedEvaluator. Prints one JSON line per mode.

Mode "e2e" measures the FULL test_net -> evaluation pipeline end to end
(reference lib/core/test_engine.py:269-310 loop + tools/evaluation.py):
JPEG decode from disk, 10-pass TTA, detections.pkl, NMS post-processing
(overlapped with device TTA by engine.test_engine._AsyncPost), COCO box
eval, then the instance-seg tail (mask NMS + RLE encode + COCOeval
segm) — one measured images/sec for the whole chain.
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _write_e2e_dataset(data_dir, n_images, n_props, rng):
    """On-disk synthetic VOC-shaped dataset: real JPEGs (decode cost is
    part of the measured pipeline), COCO json with 2 gt/image, proposal
    pkl — via the shared writer (cim_tpu.data.synthetic)."""
    from cim_tpu.data.synthetic import write_synthetic_coco_dataset

    write_synthetic_coco_dataset(
        data_dir, n_images, n_props, rng, image_hw=(375, 500),
        write_jpegs=True,
    )


def run_e2e(cfg, trainer, variables, args):
    """One wall-clock over the whole test_net -> evaluation chain."""
    from cim_tpu.data import catalog
    from cim_tpu.engine.test_engine import post_process_results, test_net
    from cim_tpu.evaluation import task_evaluation
    from tools.evaluation import eval_shard
    from tools.evaluation import coco_inst_seg_eval

    data_dir = tempfile.mkdtemp(prefix="bench_e2e_")
    rng = np.random.RandomState(0)
    _write_e2e_dataset(data_dir, args.n_images, args.n_props, rng)
    catalog.register_dataset("bench_e2e", {
        catalog.IM_DIR: data_dir,
        catalog.ANN_FN: os.path.join(data_dir, "ann.json"),
    })
    cfg.TEST.DATASETS = ("bench_e2e",)
    cfg.TPU.EVAL_BATCH = args.eval_batch

    out_dir = os.path.join(data_dir, "out")
    # Warm pass with a SHARED evaluator: trace/lower + compile (or
    # persistent-cache load) of the fused TTA buckets is per-evaluator
    # and one-time; the reference amortizes the same warmup over its ~5k
    # test images (lib/core/test_engine.py:269-310), so the steady-state
    # second pass is the comparable number. Warmup reported separately.
    from cim_tpu.engine.test import BatchedEvaluator

    evaluator = (
        BatchedEvaluator(cfg, trainer.model, variables, args.eval_batch)
        if args.eval_batch > 1 else None
    )
    tw = time.time()
    test_net(
        cfg, trainer.model, variables, "bench_e2e",
        os.path.join(data_dir, "props.pkl"), out_dir + "_warm",
        evaluator=evaluator,
    )
    t_warmup_total = time.time() - tw
    t0 = time.time()
    all_scores, roidb, dataset = test_net(
        cfg, trainer.model, variables, "bench_e2e",
        os.path.join(data_dir, "props.pkl"), out_dir,
        evaluator=evaluator,
    )
    t_detect = time.time() - t0
    all_boxes = post_process_results(cfg, all_scores, roidb, dataset)
    box_metrics = task_evaluation.evaluate_all(dataset, all_boxes, out_dir)
    t_boxeval = time.time() - t0 - t_detect

    opts = {
        "num_classes": cfg.MODEL.NUM_CLASSES,
        "score_thresh": cfg.TEST.SCORE_THRESH,
        "nms": cfg.TEST.NMS,
        "proposal_filter": True,
        "detections_per_im": cfg.TEST.DETECTIONS_PER_IM,
        "coco_scheme": False,
    }
    cat_ids = sorted(dataset.COCO.getCatIds())
    detections = {k: {"scores": v["scores"], "boxes": v["boxes"]}
                  for k, v in all_scores.items()}
    seg_results = eval_shard((opts, roidb, detections, None, cat_ids))
    seg_metrics = coco_inst_seg_eval(dataset.COCO, seg_results)
    total = time.time() - t0
    t_segeval = total - t_detect - t_boxeval

    from cim_tpu.engine.test import Evaluator

    n_passes = (
        len(Evaluator.tta_pass_list(cfg)) if cfg.TEST.BBOX_AUG.ENABLED else 1
    )
    print(json.dumps({
        "metric": "eval_pipeline_images_per_sec_e2e",
        "value": round(args.n_images / total, 3),
        "unit": "images/sec",
        "images": args.n_images,
        "passes": n_passes,
        "eval_batch": args.eval_batch,
        "s_per_image_e2e": round(total / args.n_images, 3),
        "one_time_warmup_s": round(t_warmup_total - total, 3),
        "breakdown_s_per_image": {
            "tta_detect_incl_overlapped_nms": round(t_detect / args.n_images, 3),
            "box_eval": round(t_boxeval / args.n_images, 3),
            "inst_seg_eval": round(t_segeval / args.n_images, 3),
        },
        "box_AP": float(box_metrics.get("AP", -1)),
        "inst_seg_mAP50": float(seg_metrics.get("mAP50", -1)),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=8)
    ap.add_argument("--n_props", type=int, default=1900)
    ap.add_argument("--eval_batch", type=int, default=4)
    ap.add_argument("--modes", default="seq,batched")
    ap.add_argument("--cfg", default=None, help="config yaml override")
    ap.add_argument("--int8", action="store_true",
                    help="TPU.EVAL_INT8: dynamic w8a8 MaskFuse conv+fc1")
    args = ap.parse_args()

    import jax

    from cim_tpu.config import clone_cfg, load_cfg
    from cim_tpu.engine.test import BatchedEvaluator, Evaluator
    from cim_tpu.engine.train import Trainer
    from cim_tpu.data.synthetic import make_microbatch

    cfg = clone_cfg(
        load_cfg(
            args.cfg
            or os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "configs",
                "resnet50_voc.yaml",
            )
        )
    )
    cfg.TPU.DATA_PARALLEL = 1
    cfg.TPU.PALLAS_ROI_ALIGN = jax.default_backend() not in ("cpu",)
    cfg.TPU.REMAT_BOX_HEAD = False
    if args.int8:
        cfg.TPU.EVAL_INT8 = True

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

    if "e2e" in modes:
        run_e2e(cfg, trainer, variables, args)
        modes = [m for m in modes if m != "e2e"]
        if not modes:
            return

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
