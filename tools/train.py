#!/usr/bin/env python
"""CIM training CLI (reference tools/train.py).

Replicates the reference's training contract — dataset presets, cfg yaml +
--set overrides, LR/step auto-rescaling by effective batch size
(tools/train.py:184-221), warmup/decay schedule, gradient accumulation
(iter_size), periodic + crash-save checkpoints — on a TPU device mesh.

Example:
  python tools/train.py --dataset voc2012trainaug \
      --cfg configs/resnet50_voc.yaml
  python tools/train.py --synthetic --cfg configs/resnet50_voc.yaml \
      --max_iter 20    # smoke run without data on disk
"""
import argparse
import logging
import os
import pickle
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger("tools.train")


def parse_args():
    parser = argparse.ArgumentParser(description="Train CIM (TPU)")
    parser.add_argument("--dataset", help="voc2012trainaug | coco2017train")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("--set", dest="set_cfgs", nargs="+", default=None,
                        help="config key-value pairs")
    parser.add_argument("--bs", dest="batch_size", type=int, default=None,
                        help="total images per step across devices")
    parser.add_argument("--iter_size", type=int, default=4)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--lr_decay_gamma", type=float, default=None,
                        help="override cfg.SOLVER.GAMMA (reference "
                        "tools/train.py:95-98)")
    parser.add_argument("-o", "--optimizer", default=None,
                        help="override SOLVER.TYPE (SGD | Adam)")
    parser.add_argument("--max_iter", type=int, default=None)
    parser.add_argument("--disp_interval", type=int, default=20)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--load_ckpt", default=None)
    parser.add_argument("--load_detectron", default=None,
                        help="Detectron-pkl weight file (reference "
                        "tools/train.py:338-340)")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--no_save", action="store_true")
    parser.add_argument("--use_tfboard", action="store_true")
    parser.add_argument("--start_step", type=int, default=0)
    parser.add_argument("--seed", type=int, default=3)
    parser.add_argument("--synthetic", action="store_true",
                        help="train on synthetic fixtures (no data on disk)")
    parser.add_argument("--synth_image", nargs=2, type=int, default=(256, 256),
                        help="synthetic image bucket H W")
    parser.add_argument("--synth_props", type=int, default=512,
                        help="synthetic proposal pad (bucket size)")
    parser.add_argument("--synth_valid", type=int, default=300,
                        help="synthetic valid-proposal count")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host SPMD: jax.distributed.initialize()"
                             " + one global dp mesh; launch one process per"
                             " host (each loads its own roidb shard)")
    parser.add_argument("--profile_dir", default=None,
                        help="capture a jax.profiler trace of steps 5-10")
    parser.add_argument("--debug", action="store_true")
    return parser.parse_args()


def main():
    from cim_tpu.config import assert_and_infer_cfg, cfg_from_file, cfg_from_list, get_default_cfg
    from cim_tpu.engine.stats import TrainingStats, setup_logging

    setup_logging()
    args = parse_args()

    cfg = get_default_cfg()
    cfg_from_file(cfg, args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(cfg, args.set_cfgs)

    if args.dataset == "coco2017train":
        cfg.TRAIN.DATASETS = ("coco_2017_train",)
        cfg.MODEL.NUM_CLASSES = 80
    elif args.dataset == "voc2012trainaug":
        cfg.TRAIN.DATASETS = ("voc_2012_trainaug",)
        cfg.MODEL.NUM_CLASSES = 20
    elif args.dataset is not None:
        raise ValueError(f"Unexpected args.dataset: {args.dataset}")

    if args.debug:
        cfg.DEBUG = True

    import jax

    if args.multihost:
        jax.distributed.initialize()

    # n_devices counts the GLOBAL dp extent (all hosts); n_local is what
    # this process feeds per step
    n_devices = cfg.TPU.DATA_PARALLEL or len(jax.devices())
    cfg.TPU.DATA_PARALLEL = n_devices
    if args.multihost:
        # count THIS process's rows of the dp mesh — not
        # jax.local_device_count(): TPU.DATA_PARALLEL may select a strict
        # subset of the global devices (get_mesh takes jax.devices()[:n]),
        # leaving some local devices outside the mesh
        from cim_tpu import parallel
        from cim_tpu.engine.train import get_mesh

        n_local = parallel.local_device_count(get_mesh(cfg))
    else:
        n_local = n_devices

    # ---- adaptive batch/LR/step rescaling (reference train.py:184-221) --- #
    original_batch_size = cfg.NUM_GPUS * cfg.TRAIN.IMS_PER_BATCH
    batch_size = args.batch_size or n_devices * cfg.TRAIN.IMS_PER_BATCH
    assert batch_size % n_devices == 0
    effective_batch_size = args.iter_size * batch_size
    cfg.TPU.GRAD_ACCUM = args.iter_size

    old_lr = cfg.SOLVER.BASE_LR
    cfg.SOLVER.BASE_LR *= batch_size / original_batch_size
    step_scale = original_batch_size / effective_batch_size
    cfg.SOLVER.STEPS = [int(s * step_scale + 0.5) for s in cfg.SOLVER.STEPS]
    cfg.SOLVER.MAX_ITER = int(cfg.SOLVER.MAX_ITER * step_scale + 0.5)
    logger.info(
        "batch %d x iter_size %d -> LR %g -> %g, MAX_ITER %d, STEPS %s",
        batch_size, args.iter_size, old_lr, cfg.SOLVER.BASE_LR,
        cfg.SOLVER.MAX_ITER, cfg.SOLVER.STEPS,
    )
    if args.optimizer is not None:
        cfg.SOLVER.TYPE = args.optimizer
    if args.lr is not None:
        cfg.SOLVER.BASE_LR = args.lr
    if args.lr_decay_gamma is not None:
        cfg.SOLVER.GAMMA = args.lr_decay_gamma
    if args.max_iter is not None:
        cfg.SOLVER.MAX_ITER = args.max_iter

    assert_and_infer_cfg(cfg, make_immutable=False)

    # ---------------------------- data ---------------------------------- #
    rng = np.random.RandomState(args.seed)
    if args.synthetic:
        from cim_tpu.data.synthetic import make_microbatch, make_train_batch

        kw = dict(
            image_hw=tuple(args.synth_image),
            n_props=min(cfg.TPU.PROPOSAL_PAD, args.synth_props),
            n_valid=min(cfg.TPU.PROPOSAL_PAD, args.synth_valid),
            num_classes=cfg.MODEL.NUM_CLASSES,
        )
        cfg.TPU.PROPOSAL_PAD = kw["n_props"]
        sample = make_microbatch(rng, **kw)

        def batches():
            while True:
                yield make_train_batch(rng, n_local, args.iter_size, **kw)

        loader_iter = batches()
    else:
        from cim_tpu.data.loader import TrainLoader, build_microbatch
        from cim_tpu.data.roidb import combined_roidb_for_training

        roidb, _, _ = combined_roidb_for_training(cfg)
        if args.multihost:
            from cim_tpu.parallel import host_shard_roidb

            roidb = host_shard_roidb(roidb)
        loader = TrainLoader(
            cfg, roidb, n_local, args.iter_size, seed=args.seed,
            prefetch=cfg.DATA_LOADER.PREFETCH,
        )
        entry0 = roidb[0]
        from cim_tpu.data.transforms import scale_for_target

        s = scale_for_target(
            (entry0["height"], entry0["width"]), cfg.TRAIN.SCALES[0],
            cfg.TRAIN.MAX_SIZE,
        )
        bucket = loader._entry_bucket(entry0, cfg.TRAIN.SCALES[0])[0]
        sample = build_microbatch(cfg, entry0, s, bucket, rng)
        loader_iter = iter(loader)

    # --------------------------- trainer -------------------------------- #
    from cim_tpu.engine.checkpoint import load_ckpt, save_ckpt
    from cim_tpu.engine.train import Trainer

    trainer = Trainer(cfg, jax.random.PRNGKey(args.seed), sample_batch=sample)

    # timestamped run dir (reference lib/utils/misc.py get_run_name
    # -> Outputs/<cfg>/<MonDD-HH-MM-SS_host>_step)
    import socket
    import time as _time

    run_name = "%s_%s_step" % (
        _time.strftime("%b%d-%H-%M-%S"), socket.gethostname()
    )
    output_dir = args.output_dir or os.path.join(
        cfg.OUTPUT_DIR,
        os.path.splitext(os.path.basename(args.cfg_file))[0],
        run_name,
    )
    ckpt_dir = os.path.join(output_dir, "ckpt")

    if args.load_ckpt:
        state, stats = load_ckpt(args.load_ckpt, trainer.state, trainer.stats)
        if not args.resume:
            state = state._replace(step=np.asarray(args.start_step, np.int32))
        trainer.set_state(state)  # replicates over the global mesh if needed
        trainer.set_stats(stats)  # rebinds the stats the jitted step uses
        logger.info("Loaded checkpoint; starting at step %d", int(trainer.state.step))
    elif args.load_detectron:
        from cim_tpu.utils.torch_weights import body_for_config, load_detectron_pkl

        variables = load_detectron_pkl(
            args.load_detectron, conv_body=body_for_config(cfg.MODEL.CONV_BODY),
            refine_times=cfg.REFINE_TIMES,
        )
        import jax.numpy as jnp

        trainer.state = trainer.state._replace(
            params=jax.tree.map(jnp.asarray, variables["params"])
        )
        if variables.get("stats"):
            trainer.set_stats(variables["stats"])
        logger.info("Loaded Detectron pkl weights from %s", args.load_detectron)

    # side-effect writes (checkpoints, config pickle, tensorboard) happen on
    # process 0 only: with --multihost every process sees the same
    # output_dir on a shared filesystem and concurrent identical writes can
    # corrupt checkpoints (replaces the reference's single-process
    # assumption, tools/train.py:344)
    do_save = not args.no_save and jax.process_index() == 0

    if do_save:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "config_and_args.pkl"), "wb") as f:
            pickle.dump({"cfg": dict(cfg), "args": vars(args)}, f)

    tb_writer = None
    if args.use_tfboard and do_save:
        try:
            from flax.metrics import tensorboard

            tb_writer = tensorboard.SummaryWriter(output_dir)
        except Exception as e:  # pragma: no cover
            logger.warning("tensorboard writer unavailable: %s", e)

    training_stats = TrainingStats(args.disp_interval, tb_writer)
    checkpoint_period = max(
        1, int(cfg.TRAIN.SNAPSHOT_ITERS / (n_devices * args.iter_size))
    )

    step = int(trainer.state.step)
    profiling = False
    pending = None  # (step_idx, device metrics) — one-deep pipeline

    def flush_pending(force=False):
        """Fetch + log the pipelined previous step's metrics (a device
        sync). Shared by the loop, the post-loop flush, the profiler
        stop (which must not truncate in-flight device work) and the
        crash path (so the last completed step still reaches the logs)."""
        nonlocal pending
        if pending is None:
            return False
        p_step, p_dev = pending
        pending = None
        p_metrics = {k: float(v) for k, v in p_dev.items()}
        training_stats.update_iter_stats(p_metrics)
        training_stats.log_iter_stats(
            p_step, p_metrics["lr"], cfg.SOLVER.MAX_ITER, force=force
        )
        return True

    try:
        logger.info("Training starts!")
        while step < cfg.SOLVER.MAX_ITER:
            if args.profile_dir and step == 5 and not profiling:
                import jax.profiler

                jax.profiler.start_trace(args.profile_dir)
                profiling = True
            if profiling and step >= 10:
                import jax.profiler

                flush_pending()  # sync: keep the last step in the trace
                jax.profiler.stop_trace()
                profiling = False
                logger.info("profiler trace written to %s", args.profile_dir)
            batch = next(loader_iter)
            training_stats.iter_tic()
            metrics_dev = trainer.step(
                batch, jax.random.PRNGKey(args.seed + step)
            )
            step += 1  # mirrors the on-device state.step increment
            # one-deep software pipeline: fetch the PREVIOUS step's
            # metrics after dispatching this one, so the next loop
            # iteration's host work (loader decode/pad, ~67 ms/image)
            # overlaps device compute instead of serializing with it
            # (jax dispatch is async; the former per-step float() fetch
            # was a full sync). iter time = per-loop wall time =
            # max(loader, device) in steady state; the first loop has no
            # pending fetch, so its dispatch-only wall time is NOT
            # recorded (it would skew time/eta toward zero).
            if flush_pending():
                training_stats.iter_toc()
            pending = (step - 1, metrics_dev)
            if do_save and step % checkpoint_period == 0:
                save_ckpt(ckpt_dir, trainer.state, trainer.stats)
        flush_pending(force=True)  # the last step's stats
        assert step == int(trainer.state.step), "host/device step drift"
        if do_save:
            save_ckpt(ckpt_dir, trainer.state, trainer.stats)
        logger.info("Training done at step %d", step)
    except (RuntimeError, KeyboardInterrupt):
        # crash-save (reference tools/train.py:450-456); flush the
        # pipelined metrics first so the last COMPLETED step reaches the
        # logs/tensorboard (its state is in the crash checkpoint)
        try:
            flush_pending(force=True)
        except Exception:  # the fetch itself may be what's broken
            logger.warning("pending metrics unrecoverable on crash")
        logger.info("Save ckpt on exception ...")
        if do_save:
            save_ckpt(ckpt_dir, trainer.state, trainer.stats)
        print(traceback.format_exc())
    finally:
        if tb_writer is not None:
            tb_writer.close()


if __name__ == "__main__":
    main()
