#!/usr/bin/env python
"""Inference + detection-eval CLI (reference tools/test_net.py).

Runs TTA inference over the test (or train, for CorLoc) set, writes
detections.pkl / discovery.pkl, applies NMS post-processing and VOC/COCO
detection evaluation.

Example:
  python tools/test_net.py --cfg configs/resnet50_voc.yaml \
      --load_ckpt Outputs/resnet50_voc/ckpt --dataset voc2012sbdval
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logger = logging.getLogger("tools.test_net")


def parse_args():
    # allow_abbrev=False: parent mode re-execs sys.argv into children
    # after stripping --multi_proc; an accepted abbreviation (--multi 2)
    # would survive the strip and leak into child argv
    parser = argparse.ArgumentParser(description="Test CIM (TPU)",
                                     allow_abbrev=False)
    parser.add_argument("--dataset",
                        help="voc2012sbdval | voc2012trainaug | coco2017val")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("--set", dest="set_cfgs", nargs="+", default=None)
    parser.add_argument("--load_ckpt", help="checkpoint directory")
    parser.add_argument("--load_detectron", default=None,
                        help="Detectron-pkl checkpoint (reference "
                        "tools/test_net.py:49-50); --vis is omitted: the "
                        "reference only sets cfg.VIS, nothing reads it "
                        "(lib/core/config.py:498) — use "
                        "tools/visualize_results.py")
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--range", nargs=2, type=int, default=None,
                        help="start end image index range")
    parser.add_argument("--multi_proc", type=int, default=0,
                        help="parent mode: spawn N child processes over "
                        "contiguous --range shards and merge (reference "
                        "multi_gpu_test_net_on_dataset + utils/subprocess.py)")
    parser.add_argument("--wait", action="store_true",
                        help="wait for the checkpoint to appear")
    parser.add_argument("--corloc", action="store_true",
                        help="train-set discovery protocol (CorLoc eval + "
                        "discovery.pkl) on any dataset; implied by "
                        "--dataset voc2012trainaug like the reference")
    return parser.parse_args()


def main():
    from cim_tpu.config import assert_and_infer_cfg, cfg_from_file, cfg_from_list, get_default_cfg
    from cim_tpu.engine.stats import setup_logging

    setup_logging()
    args = parse_args()

    cfg = get_default_cfg()
    cfg_from_file(cfg, args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(cfg, args.set_cfgs)

    check_corloc = False
    if args.dataset == "voc2012sbdval":
        cfg.TEST.DATASETS = ("voc_2012_sbdval",)
        cfg.MODEL.NUM_CLASSES = 20
    elif args.dataset == "voc2012trainaug":
        cfg.TEST.DATASETS = ("voc_2012_trainaug",)
        cfg.MODEL.NUM_CLASSES = 20
        check_corloc = True  # train-set inference = discovery/CorLoc protocol
    elif args.dataset == "coco2017val":
        cfg.TEST.DATASETS = ("coco_2017_val",)
        cfg.MODEL.NUM_CLASSES = 80
    elif args.dataset == "coco2017testdev":
        cfg.TEST.DATASETS = ("coco_2017_test-dev",)
        cfg.MODEL.NUM_CLASSES = 80
    elif args.dataset is not None:
        raise ValueError(f"Unexpected args.dataset: {args.dataset}")
    check_corloc = check_corloc or args.corloc
    assert_and_infer_cfg(cfg, make_immutable=False)

    output_dir_early = args.output_dir or os.path.join(
        cfg.OUTPUT_DIR,
        os.path.splitext(os.path.basename(args.cfg_file))[0],
        "test",
    )
    if args.multi_proc and args.multi_proc > 1 and args.range is None:
        # parent mode: no model here — children do the device work
        from cim_tpu.engine.test_engine import multi_process_inference

        os.makedirs(output_dir_early, exist_ok=True)
        child_argv = [os.path.abspath(__file__)]
        skip = 0
        for a in sys.argv[1:]:
            if skip:
                skip -= 1
                continue
            if a == "--multi_proc":
                skip = 1
                continue
            if a.startswith("--multi_proc="):
                continue
            child_argv.append(a)
        if not args.output_dir:
            child_argv += ["--output_dir", output_dir_early]
        results, _, _ = multi_process_inference(
            cfg, child_argv, args.multi_proc, output_dir_early,
            check_corloc=check_corloc, check_expected_results=True,
        )
        logger.info(
            "Results: %s", {k: v for k, v in results.items() if k != "per_class"}
        )
        return

    import jax

    from cim_tpu.engine.checkpoint import load_ckpt
    from cim_tpu.engine.test_engine import run_inference
    from cim_tpu.engine.train import Trainer
    from cim_tpu.data.synthetic import make_microbatch
    import numpy as np

    # build the model and restore weights
    rng = np.random.RandomState(0)
    sample = make_microbatch(
        rng, image_hw=(128, 128), n_props=64, n_valid=64,
        num_classes=cfg.MODEL.NUM_CLASSES,
    )
    saved_pad = cfg.TPU.PROPOSAL_PAD
    cfg.TPU.PROPOSAL_PAD = 64
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=sample)
    cfg.TPU.PROPOSAL_PAD = saved_pad

    if args.load_ckpt:
        if args.wait:
            # reference test_net.py:156-163 busy-waits for the ckpt file
            from cim_tpu.engine.checkpoint import wait_for_checkpoint

            wait_for_checkpoint(args.load_ckpt)
        state, stats = load_ckpt(args.load_ckpt, trainer.state, trainer.stats)
        trainer.state = state
        trainer.stats = stats  # only read into `variables` below; the
        # compiled *train* step is not reused here
        # state.step IS the completed-step count == the snapshot label
        # (checkpoint.py load_ckpt restores exactly `step`)
        logger.info("Loaded checkpoint at step %d", int(state.step))
    elif args.load_detectron:
        import jax.numpy as jnp

        from cim_tpu.utils.torch_weights import body_for_config, load_detectron_pkl

        loaded = load_detectron_pkl(
            args.load_detectron, conv_body=body_for_config(cfg.MODEL.CONV_BODY),
            refine_times=cfg.REFINE_TIMES,
        )
        trainer.state = trainer.state._replace(
            params=jax.tree.map(jnp.asarray, loaded["params"])
        )
        if loaded.get("stats"):
            trainer.stats = jax.tree.map(jnp.asarray, loaded["stats"])
        logger.info("Loaded Detectron pkl weights from %s", args.load_detectron)

    variables = {"params": trainer.state.params, "stats": trainer.stats}
    output_dir = output_dir_early
    results, _, _ = run_inference(
        cfg,
        trainer.model,
        variables,
        output_dir,
        check_corloc=check_corloc,
        check_expected_results=True,
        ind_range=args.range,
    )
    if results is not None:
        logger.info(
            "Results: %s", {k: v for k, v in results.items() if k != "per_class"}
        )


if __name__ == "__main__":
    main()
