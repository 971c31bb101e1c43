"""Full-pipeline numeric parity: cim_tpu vs a torch oracle of the reference.

One shared random weight set (exported as a reference-naming state_dict,
converted with utils.torch_weights.convert_reference_checkpoint) drives
both a torch transliteration of Generalized_RCNN.forward + losses
(tests/oracle_model.py; reference lib/modeling/model_builder.py:117-207)
and the assembled cim_tpu chain (CIMModel.apply + engine.train
compute_losses). If any link drifts — layout, RoIAlign scaling, head
wiring, masking/padding, mining, loss assembly — these tests fail.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from cim_tpu.config import clone_cfg, get_default_cfg
from cim_tpu.data.synthetic import make_microbatch
from cim_tpu.engine.train import compute_losses
from cim_tpu.models.builder import build_model
from cim_tpu.utils.torch_weights import convert_reference_checkpoint
from tests.oracle_model import TorchCIMOracle, oracle_loss_assembly, randomize_bn_stats

N_VALID = 28
N_PAD = 32
IMAGE_HW = (96, 128)


def _cfg():
    cfg = clone_cfg(get_default_cfg())
    cfg.MODEL.NUM_CLASSES = 20
    cfg.REFINE_TIMES = 3
    cfg.p_seed = 0.4  # mine a handful of seeds from N=28 proposals
    cfg.step_rate = 0.05
    cfg.adj_thr = 0.85
    cfg.Anti_noise_sampling = False  # stochastic path off for bit-parity
    cfg.TPU.PRECISION = "f32"
    cfg.TPU.PROPOSAL_PAD = N_PAD
    cfg.TPU.MAX_CLUSTERS = 8
    cfg.TPU.PALLAS_ROI_ALIGN = False
    cfg.TPU.REMAT_BOX_HEAD = False
    return cfg


@pytest.fixture(scope="module")
def shared():
    """Torch oracle model + converted flax variables + one fixture batch."""
    torch.manual_seed(0)
    rng = np.random.RandomState(7)
    oracle = TorchCIMOracle(num_classes=20, refine_times=3)
    randomize_bn_stats(oracle, rng)
    variables = convert_reference_checkpoint(
        oracle.state_dict(), conv_body="resnet50", refine_times=3
    )
    variables = jax.tree.map(jnp.asarray, variables)

    # fixture rois stay <= 224px so the adaptive RoIAlign grid (<= cap 2)
    # reproduces mmcv exactly (ops/roi_align.py docstring)
    batch = make_microbatch(
        rng, image_hw=IMAGE_HW, n_props=N_PAD, n_valid=N_VALID,
        num_classes=20, n_labels=3, mask_grid=64,
    )
    return oracle, variables, batch


def _torch_forward(oracle, batch):
    image = torch.from_numpy(np.ascontiguousarray(batch["image"].transpose(2, 0, 1)))
    rois = torch.from_numpy(batch["rois"][:N_VALID])
    masks = torch.from_numpy(batch["masks"][:N_VALID])
    with torch.no_grad():
        p_cls, p_det, r_cls, r_iou = oracle(image, rois, masks)
    return (
        p_cls.numpy(),
        p_det.numpy(),
        [r.numpy() for r in r_cls],
        [r.numpy() for r in r_iou],
    )


def _jax_forward(cfg, variables, batch):
    model = build_model(cfg)
    out = jax.jit(model.apply)(
        variables,
        batch["image"],
        batch["rois"],
        batch["masks"],
        jnp.asarray(batch["valid"]),
    )
    return jax.tree.map(np.asarray, out)


def test_head_scores_match_torch_oracle(shared):
    """data -> backbone -> RoIAlign -> MaskFuse -> heads, both stacks."""
    oracle, variables, batch = shared
    p_cls, p_det, r_cls, r_iou = _torch_forward(oracle, batch)
    out = _jax_forward(_cfg(), variables, batch)

    # valid rows match; tolerance covers fp32 conv-order differences
    # accumulated through ~40 conv layers + 2 FC-4096
    np.testing.assert_allclose(
        out["predict_cls"][:N_VALID], p_cls, rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        out["predict_det"][:N_VALID], p_det, rtol=2e-3, atol=2e-4
    )
    for k in range(3):
        np.testing.assert_allclose(
            out["refine_cls"][k, :N_VALID], r_cls[k], rtol=2e-3, atol=2e-4
        )
        np.testing.assert_allclose(
            out["refine_iou"][k, :N_VALID], r_iou[k], rtol=2e-3, atol=2e-4
        )
    # padding rows carry no proposal-softmax mass
    assert out["predict_det"][N_VALID:].max() < 1e-12


def test_train_losses_match_torch_oracle(shared):
    """The full train-step loss vector matches the reference assembly
    (model_builder.py:161-207) computed by the torch+numpy oracle."""
    oracle, variables, batch = shared
    cfg = _cfg()

    p_cls, p_det, r_cls, r_iou = _torch_forward(oracle, batch)
    want = oracle_loss_assembly(
        p_cls, p_det, r_cls, r_iou,
        labels=batch["labels"],
        mat=np.asarray(batch["mat"][:N_VALID]),
        iou_map=batch["iou_map"][:N_VALID, :N_VALID].astype(np.float32),
        asy_iou_map=batch["asy_iou_map"][:N_VALID, :N_VALID].astype(np.float32),
        p_seed=cfg.p_seed,
        step_rate=cfg.step_rate,
        con_thr=cfg.adj_thr,
    )
    # the oracle must actually exercise the refinement branches
    assert want["cls_loss"] != 0.0 and want["bag_loss"] != 0.0

    model = build_model(cfg)

    def loss_fn(batch_j):
        out = model.apply(
            variables, batch_j["image"], batch_j["rois"], batch_j["masks"],
            batch_j["valid"],
        )
        return compute_losses(cfg, out, batch_j, jax.random.PRNGKey(0))

    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    got = jax.tree.map(np.asarray, jax.jit(loss_fn)(batch_j))

    for key in ("bag_loss", "pcl_loss", "cls_loss", "iou_loss"):
        np.testing.assert_allclose(
            got[key], want[key], rtol=5e-3, atol=5e-4,
            err_msg=f"{key} diverged from the reference assembly",
        )


def test_tta_eval_matches_torch_oracle(shared):
    """Eval chain parity: the real Evaluator (uint8 BGR input, bucket
    padding, device normalization, hflip TTA, K-head + pass averaging)
    against a torch-oracle recomputation, and the NMS+limit detections
    derived from both (reference im_detect_bbox_aug lib/core/test.py:
    149-240 + box_results_with_nms_and_limit :355-423)."""
    from cim_tpu.data.transforms import TORCH_MEAN, TORCH_STD
    from cim_tpu.engine.test import Evaluator, box_results_with_nms_and_limit

    oracle, variables, batch = shared
    cfg = _cfg()
    cfg.transform_mode = "ToTensor"
    cfg.TEST.SCALE = IMAGE_HW[1]  # max side -> im_scale == 1.0 (no resize)
    cfg.TEST.BBOX_AUG.ENABLED = True
    cfg.TEST.BBOX_AUG.H_FLIP = True
    cfg.TEST.BBOX_AUG.SCALES = ()
    cfg.TEST.BBOX_AUG.SCORE_HEUR = "AVG"
    cfg.TEST.BBOX_AUG.COORD_HEUR = "ID"

    rng = np.random.RandomState(11)
    h, w = IMAGE_HW
    im_bgr = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    boxes = batch["rois"][:N_VALID]
    masks7 = batch["masks"][:N_VALID]

    model = build_model(cfg)
    ev = Evaluator(cfg, model, variables)
    got_scores, got_boxes = ev.im_detect_all(im_bgr, boxes, masks7)

    # ---- torch oracle of the same two TTA passes ---------------------- #
    def torch_scores(im_b, bxs, msks):
        im_norm = (
            im_b[:, :, ::-1].astype(np.float32) / 255.0 - TORCH_MEAN
        ) / TORCH_STD
        image = torch.from_numpy(np.ascontiguousarray(im_norm.transpose(2, 0, 1)))
        with torch.no_grad():
            _, _, r_cls, r_iou = oracle(
                image, torch.from_numpy(bxs), torch.from_numpy(msks)
            )
        # testing_function (model_builder.py:60-68) + K-mean (test.py:130-133)
        return np.mean(
            [(c.numpy() * i.numpy())[:, 1:] for c, i in zip(r_cls, r_iou)], axis=0
        )

    s_id = torch_scores(im_bgr, boxes, masks7)
    # hflip pass (reference test.py:243-265): flip image, boxes, 7x7 masks
    boxes_hf = boxes.copy()
    boxes_hf[:, 0] = w - boxes[:, 2] - 1
    boxes_hf[:, 2] = w - boxes[:, 0] - 1
    s_hf = torch_scores(
        np.ascontiguousarray(im_bgr[:, ::-1]), boxes_hf,
        np.ascontiguousarray(np.flip(masks7, 2)),
    )
    want_scores = (s_id + s_hf) / 2.0

    np.testing.assert_allclose(got_scores, want_scores, rtol=2e-3, atol=2e-5)
    np.testing.assert_array_equal(got_boxes, boxes)

    # ---- detections through NMS + limit on both score sets ------------ #
    _, _, cls_got = box_results_with_nms_and_limit(cfg, got_scores, boxes)
    _, _, cls_want = box_results_with_nms_and_limit(cfg, want_scores, boxes)
    assert len(cls_got) == len(cls_want) == cfg.MODEL.NUM_CLASSES + 1
    for j in range(1, cfg.MODEL.NUM_CLASSES + 1):
        assert cls_got[j].shape == cls_want[j].shape, f"class {j} keep set"
        if cls_got[j].size:
            np.testing.assert_allclose(
                cls_got[j], cls_want[j], rtol=2e-3, atol=2e-5
            )


def test_grads_match_torch_oracle(shared):
    """END-TO-END BACKWARD parity: d(total_loss)/d(params) of the full
    chain (backbone conv -> RoIAlign -> MaskFuse -> heads -> mining ->
    all four losses) matches torch autograd through the oracle, for every
    parameter tensor in the model.

    The torch gradients are mapped into the flax tree with the SAME
    converter the checkpoints use (layout transposes are linear, so
    gradients map identically), giving complete per-leaf coverage without
    hand-written name pairs. This pins the training signal itself — wiring
    bugs that preserve loss values but corrupt gradients (wrong
    stop_gradient placement, masked-softmax backward, frozen-BN backward,
    RoIAlign scatter) fail here."""
    from tests.oracle_model import (
        TorchRoIAlignDiff,
        oracle_forward_grad,
        torch_loss_assembly_grad,
    )

    oracle, variables, batch = shared
    cfg = _cfg()

    # ---- torch backward ------------------------------------------------ #
    oracle.zero_grad(set_to_none=False)
    old_ra = oracle.Box_Head.roi_align
    oracle.Box_Head.roi_align = TorchRoIAlignDiff(
        7, oracle.Conv_Body.spatial_scale, sampling_ratio=0
    )
    try:
        image = torch.from_numpy(
            np.ascontiguousarray(batch["image"].transpose(2, 0, 1))
        )
        p_cls, p_det, r_cls, r_iou = oracle_forward_grad(
            oracle, image,
            torch.from_numpy(batch["rois"][:N_VALID]),
            torch.from_numpy(batch["masks"][:N_VALID]),
        )
        losses_t = torch_loss_assembly_grad(
            p_cls, p_det, r_cls, r_iou,
            labels=batch["labels"],
            mat=np.asarray(batch["mat"][:N_VALID]),
            iou_map=batch["iou_map"][:N_VALID, :N_VALID].astype(np.float32),
            asy_iou_map=batch["asy_iou_map"][:N_VALID, :N_VALID].astype(
                np.float32
            ),
            p_seed=cfg.p_seed, step_rate=cfg.step_rate, con_thr=cfg.adj_thr,
        )
        total_t = sum(losses_t.values())
        assert float(total_t.detach()) > 0
        total_t.backward()
    finally:
        oracle.Box_Head.roi_align = old_ra

    grads_sd = {
        name: (torch.zeros_like(p) if p.grad is None else p.grad)
        for name, p in oracle.named_parameters()
    }
    grads_sd.update(dict(oracle.named_buffers()))  # converter reads BN stats
    g_torch = convert_reference_checkpoint(
        grads_sd, conv_body="resnet50", refine_times=3
    )["params"]

    # ---- jax backward --------------------------------------------------- #
    model = build_model(cfg)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    stats = variables.get("stats", {})

    def total_loss(params):
        out = model.apply(
            {"params": params, "stats": stats},
            batch_j["image"], batch_j["rois"], batch_j["masks"],
            batch_j["valid"],
        )
        l = compute_losses(cfg, out, batch_j, jax.random.PRNGKey(0))
        return l["bag_loss"] + l["pcl_loss"] + l["cls_loss"] + l["iou_loss"]

    g_jax = jax.jit(jax.grad(total_loss))(variables["params"])

    # ---- per-leaf comparison -------------------------------------------- #
    flat_t = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, g_torch)
    )[0]
    flat_j = {
        jax.tree_util.keystr(kp): np.asarray(v)
        for kp, v in jax.tree_util.tree_flatten_with_path(g_jax)[0]
    }
    assert len(flat_t) == len(flat_j)
    checked = nonzero = 0
    for kp, gt in flat_t:
        key = jax.tree_util.keystr(kp)
        gj = flat_j[key]
        assert gj.shape == gt.shape, key
        nt, nj = np.linalg.norm(gt), np.linalg.norm(gj)
        # mathematically-zero grads are fp noise on both sides (e.g. the
        # detector bias: the dim-0 proposal softmax is invariant to a
        # per-class constant) — skip the relative check below noise floor
        if nt < 1e-7 and nj < 1e-7:
            checked += 1
            continue
        rel = np.linalg.norm(gj - gt) / (nt + 1e-12)
        assert rel < 2e-2, f"{key}: rel-L2 {rel:.4g} (|g|={nt:.3g})"
        checked += 1
        nonzero += 1
    assert checked == len(flat_t)
    # the fixture must actually push gradient into the trunk
    assert nonzero > 100, f"only {nonzero} nonzero grad leaves"
