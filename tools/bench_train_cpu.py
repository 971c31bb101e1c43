#!/usr/bin/env python
"""Same-silicon FULL-TRAIN-STEP measurement: executed reference vs cim_tpu.

bench.py's `vs_baseline` anchors on a FLOP-derived estimate (the
reference publishes no throughput and requires CUDA,
reference tools/train.py:163). tools/bench_mining_cpu.py already
measures the mining layer on identical CPU hardware; this tool extends
that same-silicon methodology to the WHOLE optimizer step:

  reference side: the reference's OWN `Generalized_RCNN`
    (lib/modeling/model_builder.py:71 — the exact module
    tests/test_reference_exec_model_builder.py executes for gradient
    parity, resnet50 flagship body) driven by the reference inner loop —
    `optimizer.zero_grad()`; iter_size× [forward → total_loss →
    backward(retain_graph=True)]; `optimizer.step()` (reference
    tools/train.py:420-437) with the reference's bias/non-bias SGD
    param groups (tools/train.py:282-311), including its per-forward
    iou/asy-iou pickle reads (model_builder.py:147-159).
  cim_tpu side: `engine.train.Trainer.step` (grad_accum == iter_size)
    on identical shapes/batch content, jit-compiled on the SAME CPU.

The one non-reference piece in the torch graph is the RoIAlign stand-in
(mmcv needs CUDA): the differentiable torch shim the gradient-parity
test uses (tests/oracle_model.TorchRoIAlignDiff) — its cost at these
shapes is <2% of the reference step (one sparse gather + index_add vs
multi-second convs), so it does not distort the ratio.

Shapes are reduced (a full 2000-proposal step is ~45 TFLOP — minutes
per step per side on one CPU core); the ratio is a framework/step
comparison at identical shape, not a TPU-vs-GPU claim. bench.py reads
the committed artifact (BENCH_CPU_ANCHOR.json) and reports this
measured basis alongside the FLOP-derived anchor.

Usage:
  python tools/bench_train_cpu.py [--n_valid 48 --n_pad 64 --reps 3]
"""
import argparse
import json
import os
import pickle
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_valid", type=int, default=48)
    ap.add_argument("--n_pad", type=int, default=64)
    ap.add_argument("--image_hw", nargs=2, type=int, default=(96, 128))
    ap.add_argument("--iter_size", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_CPU_ANCHOR.json"))
    return ap.parse_args()


def time_reference(args):
    """Executed reference Generalized_RCNN + torch SGD inner loop."""
    import torch

    from cim_tpu.data.synthetic import make_microbatch
    from tests.test_reference_exec_model_builder import (
        _RoIAlignDiffShim,
        _cpu_cuda,
        _import_model_builder,
    )

    mb, cfg_mod = _import_model_builder()
    rcfg = cfg_mod.cfg
    import tempfile

    tmp = tempfile.mkdtemp(prefix="anchor_iou_")
    iou_dir = os.path.join(tmp, "iou")
    asy_dir = os.path.join(tmp, "asy")
    os.makedirs(iou_dir)
    os.makedirs(asy_dir)

    rcfg.immutable(False)
    rcfg.MODEL.NUM_CLASSES = 20
    rcfg.MODEL.CONV_BODY = "resnet50.torch_resnet50"
    rcfg.MODEL.LOAD_IMAGENET_PRETRAINED_WEIGHTS = False
    rcfg.FAST_RCNN.ROI_BOX_HEAD = "resnet50.MaskFuse"
    rcfg.FAST_RCNN.ROI_XFORM_METHOD = "RoIAlign"
    rcfg.FAST_RCNN.ROI_XFORM_RESOLUTION = 7
    rcfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO = 0
    rcfg.REFINE_TIMES = 3
    rcfg.p_seed = 0.4
    rcfg.step_rate = 0.05
    rcfg.Anti_noise_sampling = False
    rcfg.VGG_CLS_FEATURE = False
    rcfg.HRNET_CLS_FEATURE = False
    rcfg.TRAIN.FREEZE_CONV_BODY = False
    rcfg.ResNet.FREEZE_AT = 2
    rcfg.iou_dir = iou_dir
    rcfg.asy_iou_dir = asy_dir

    torch.manual_seed(1)
    model = mb.Generalized_RCNN()
    # perf-fair RoIAlign: differentiable torch shim (same spec as the
    # gradient-parity test), swapped in for the numpy parity shim
    mb.RoIAlign = _RoIAlignDiffShim
    model.train()

    # reference bias/non-bias param groups (tools/train.py:282-311)
    bias_params, nonbias_params = [], []
    for key, value in model.named_parameters():
        if value.requires_grad:
            (bias_params if "bias" in key else nonbias_params).append(value)
    lr = 5e-4  # configs/resnet50_voc.yaml SOLVER.BASE_LR
    params = [
        {"params": nonbias_params, "lr": lr, "weight_decay": 5e-4},
        {"params": bias_params, "lr": lr * 2, "weight_decay": 0},
    ]
    optimizer = torch.optim.SGD(params, momentum=0.9)

    rng = np.random.RandomState(7)
    n_valid, n_pad = args.n_valid, args.n_pad
    batch = make_microbatch(
        rng, image_hw=tuple(args.image_hw), n_props=n_pad, n_valid=n_valid,
        num_classes=20, n_labels=3, mask_grid=64,
    )
    name = "anchor_0001"
    for d, k in ((iou_dir, "iou_map"), (asy_dir, "asy_iou_map")):
        with open(os.path.join(d, name + ".pkl"), "wb") as f:
            pickle.dump(batch[k][:n_valid, :n_valid].astype(np.float32), f)
    path = os.path.join("/nonexistent", name + ".jpg")

    image = torch.from_numpy(
        np.ascontiguousarray(batch["image"].transpose(2, 0, 1))
    )[None]
    rois5 = np.concatenate(
        [np.zeros((n_valid, 1), np.float32), batch["rois"][:n_valid]], axis=1
    )
    rois = torch.from_numpy(rois5)[None]
    masks = torch.from_numpy(batch["masks"][:n_valid])[None]
    labels = torch.from_numpy(batch["labels"][None])[None]
    mat = torch.from_numpy(batch["mat"][:n_valid].astype(np.float32))[None]
    gtrois = torch.zeros((1, 5), dtype=torch.float32)
    index = torch.arange(n_valid, dtype=torch.float32)[None]

    def opt_step():
        optimizer.zero_grad()
        for _ in range(args.iter_size):
            with _cpu_cuda():
                rd = model(image, rois, masks, labels, gtrois, mat,
                           path=path, index=index)
            total = sum(rd["losses"].values())
            total.backward(retain_graph=True)
        optimizer.step()
        return float(total.detach())

    last = opt_step()  # warm (autograd graph alloc, shim weight build)
    assert np.isfinite(last)
    t0 = time.time()
    for _ in range(args.reps):
        last = opt_step()
    dt = (time.time() - t0) / args.reps
    assert np.isfinite(last)
    return dt, batch


def time_ours(args, batch):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cim_tpu.config import clone_cfg, load_cfg
    from cim_tpu.engine.train import Trainer

    cfg = clone_cfg(load_cfg(os.path.join(REPO, "configs", "resnet50_voc.yaml")))
    cfg.TPU.DATA_PARALLEL = 1
    cfg.TPU.PALLAS_ROI_ALIGN = False  # CPU: XLA RoIAlign path
    # GEMM spelling of the head conv: XLA:CPU's weight-grad conv for the
    # canonical spelling falls back to a naive scalar loop (measured
    # 88 s/execution — 94% of the whole step); the GEMM spelling is the
    # same math on the same silicon and is what cuDNN does for the torch
    # side anyway (implicit GEMM). See layers._Im2ColConv.
    cfg.TPU.CONV_IM2COL = True
    cfg.TPU.REMAT_BOX_HEAD = False
    cfg.TPU.PRECISION = "f32"  # torch CPU is f32; compare like for like
    cfg.TPU.PROPOSAL_PAD = args.n_pad
    cfg.TPU.GRAD_ACCUM = args.iter_size
    cfg.Anti_noise_sampling = False

    # (n_devices=1, grad_accum) leading dims (data.synthetic.make_train_batch
    # layout); the SAME microbatch in every accum slot, mirroring the
    # reference loop above which feeds identical input_data each inner iter
    micro = {k: jnp.asarray(v) for k, v in batch.items()}
    train_batch = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None, None], (1, args.iter_size) + x.shape),
        micro,
    )
    trainer = Trainer(cfg, jax.random.PRNGKey(0), sample_batch=batch)

    m = trainer.step(train_batch, jax.random.PRNGKey(1))  # compile
    assert np.isfinite(float(m["total_loss"]))
    t0 = time.time()
    for i in range(args.reps):
        m = trainer.step(train_batch, jax.random.PRNGKey(2 + i))
        float(m["total_loss"])
    dt = (time.time() - t0) / args.reps
    return dt


def conv_microbench(args, reps=3):
    """Attribution: the SAME MaskFuse conv (3x3, 2C->C on Nx7x7) in torch
    (MKL) vs jitted XLA:CPU — the dominant FLOPs of both steps. On TPU
    this conv runs on the MXU at 0.983 MFU (README); on CPU the two
    frameworks' conv kernels differ by an order of magnitude, which is a
    CPU-backend property, not a program-structure one. Reported so the
    full-step CPU ratio can be read for what it is."""
    import time as _t

    import torch

    import jax
    import jax.numpy as jnp

    n = args.n_valid
    rng = np.random.RandomState(0)
    x = rng.randn(n, 7, 7, 2048).astype(np.float32)
    w = (rng.randn(3, 3, 2048, 1024) * 0.02).astype(np.float32)

    tx = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    tw = torch.from_numpy(np.ascontiguousarray(w.transpose(3, 2, 0, 1)))
    torch.nn.functional.conv2d(tx, tw, padding=1)  # warm
    t0 = _t.time()
    for _ in range(reps):
        torch.nn.functional.conv2d(tx, tw, padding=1)
    torch_s = (_t.time() - t0) / reps

    f = jax.jit(lambda a, k: jax.lax.conv_general_dilated(
        a, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    jx, jw = jnp.asarray(x), jnp.asarray(w)
    jax.block_until_ready(f(jx, jw))  # compile
    t0 = _t.time()
    for _ in range(reps):
        jax.block_until_ready(f(jx, jw))
    xla_s = (_t.time() - t0) / reps
    return {"torch_mkl_s": round(torch_s, 3), "xla_cpu_s": round(xla_s, 3),
            "xla_over_torch": round(xla_s / torch_s, 1)}


def main():
    args = parse_args()
    ref_s, batch = time_reference(args)
    ours_s = time_ours(args, batch)
    conv = conv_microbench(args)
    per_img = args.iter_size
    out = {
        "metric": "full_train_step_same_cpu",
        "n_valid": args.n_valid,
        "n_pad": args.n_pad,
        "image_hw": list(args.image_hw),
        "iter_size": args.iter_size,
        "reference_s_per_optstep": round(ref_s, 3),
        "cim_tpu_s_per_optstep": round(ours_s, 3),
        "reference_s_per_image": round(ref_s / per_img, 3),
        "cim_tpu_s_per_image": round(ours_s / per_img, 3),
        "measured_cpu_ratio": round(ref_s / ours_s, 2),
        "maskfuse_conv_microbench": conv,
        "note": (
            "identical shapes/batch + same host CPU core; reference = "
            "executed lib/modeling/model_builder.py Generalized_RCNN "
            "(resnet50 body) with the reference inner loop "
            "(tools/train.py:420-437) incl. its per-forward iou-pkl "
            "reads; the torch RoIAlign stand-in costs <2% of the "
            "reference step at these shapes; ours = Trainer.step "
            "jitted on the same CPU. Reduced shape (full-shape steps "
            "are minutes/side on one core); framework ratio only, "
            "not a TPU-vs-GPU claim."
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
