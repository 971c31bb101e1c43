"""Golden parity against the *executed* reference code.

Every other parity test in this suite compares cim_tpu against
builder-written transliterations (tests/oracle_cim.py, tests/oracle_model.py).
If the transliteration mis-read the reference, both sides agree and are both
wrong. This module removes that caveat for the core algorithm: it imports
/root/reference/lib/modeling/heads.py itself (the real CIM implementation,
heads.py:10-166 losses + heads.py:222-502 CIM_layer) and golden-compares its
outputs against cim_tpu.mining on shared fixtures.

Two tiny, behavior-preserving shims make the reference importable on this
CPU-only rig (verified not to change any computed value):
  - ``torchvision.ops`` is absent here; heads.py imports ``box_iou, nms``
    (heads.py:5). ``nms`` is only reached when ``iou_map is None``
    (heads.py:302,377) — every shipped config passes iou_map, and so do these
    tests, so the stub raises if touched. ``box_iou`` is only reached in
    ``forward`` when ``iou_map is None`` (heads.py:432-433) — same story.
  - ``PCL_loss`` opens with ``torch.tensor(0.).cuda(device=labels.device)``
    (heads.py:11); on CPU-only torch ``.cuda`` raises, so it is patched to
    identity *during the call only*. The tensor's value (0.0) is what enters
    the math; its device is irrelevant on CPU.

The jax side runs PADDED (extra rows + validity mask), so these tests also
pin the padding construction itself against real reference execution.
"""
from __future__ import annotations

import contextlib
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cim_tpu.mining import losses as L
from cim_tpu.mining.cim import (
    MiningParams,
    assign_pseudo_labels,
    cim_layer,
    cim_mine,
    mist_mine,
)
from cim_tpu.ops.nms import greedy_nms_from_iou

REF_HEADS = "/root/reference/lib/modeling/heads.py"


def _torch_box_iou(a, b):
    """torchvision.ops.box_iou semantics (xyxy, no +1 convention)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def _stub_nms(*a, **k):  # pragma: no cover - must never be reached
    raise AssertionError(
        "reference heads.py called torchvision nms; tests always pass iou_map"
    )


@pytest.fixture(scope="module")
def ref_heads():
    """Import the reference heads.py with a minimal torchvision.ops stub."""
    had_tv = "torchvision" in sys.modules
    had_ops = "torchvision.ops" in sys.modules
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.box_iou = _torch_box_iou
    ops.nms = _stub_nms
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    try:
        spec = importlib.util.spec_from_file_location("_ref_heads", REF_HEADS)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        # the module keeps its own references; don't leak stubs to other tests
        if not had_tv:
            sys.modules.pop("torchvision", None)
        if not had_ops:
            sys.modules.pop("torchvision.ops", None)
    return mod


@contextlib.contextmanager
def _cpu_cuda():
    """Make `.cuda(device=...)` a no-op for PCL_loss (heads.py:11)."""
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = orig


# --------------------------------------------------------------------------- #
# Shared fixtures
# --------------------------------------------------------------------------- #


def _instance(rng, n=60, c=20, n_labels=3, agnostic=False, grid=14):
    """Random but realistic CIM inputs: iou/asy matrices computed exactly
    from random binary masks (so diag == 1 and containment is consistent),
    dirichlet scores (a.s. positive, no accidental ties)."""
    masks = rng.rand(n, grid, grid) > rng.uniform(0.4, 0.7)
    flat = masks.reshape(n, -1).astype(np.float64)
    inter = flat @ flat.T
    area = flat.sum(-1)
    union = area[:, None] + area[None, :] - inter
    iou = (inter / np.maximum(union, 1)).astype(np.float32)
    asy = (inter / np.maximum(area[None, :], 1)).astype(np.float32)
    cls = rng.dirichlet(np.ones(c + 1), size=n).astype(np.float32)
    if agnostic:
        det = rng.rand(n, 1).astype(np.float32)
        det /= det.sum()
    else:
        det = rng.dirichlet(np.ones(n), size=c + 1).T.astype(np.float32).copy()
    labels = np.zeros(c, np.float32)
    labels[rng.choice(c, n_labels, replace=False)] = 1
    # rois with the batch-index column the reference strips (heads.py:413)
    wh = rng.uniform(20, 200, size=(n, 2)).astype(np.float32)
    xy = rng.uniform(0, 300, size=(n, 2)).astype(np.float32)
    rois = np.concatenate(
        [np.zeros((n, 1), np.float32), xy, xy + wh], axis=1
    )
    return cls, det, labels, iou, asy, rois


def _pad_rows(x, pad, fill=0.0):
    return np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1), constant_values=fill)


def _pad2(m, pad):
    return np.pad(m, [(0, pad), (0, pad)], constant_values=0.0)


PARAMS = MiningParams(p_seed=0.1, cls_thr=0.25, iou_thr=0.5, con_thr=0.85,
                      anti_noise=False)


def _ref_layer(ref_heads, anti_noise=False):
    return ref_heads.CIM_layer(
        p_seed=PARAMS.p_seed,
        cls_thr=PARAMS.cls_thr,
        iou_thr=PARAMS.iou_thr,
        con_thr=PARAMS.con_thr,
        Anti_noise_sampling=anti_noise,
    )


# --------------------------------------------------------------------------- #
# instance_nms (heads.py:237-258) vs greedy_nms_from_iou
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_instance_nms_parity(ref_heads, seed):
    rng = np.random.RandomState(seed)
    n = 30
    _, _, _, iou, _, _ = _instance(rng, n=n)
    scores = rng.rand(n).astype(np.float32)
    layer = _ref_layer(ref_heads)
    inst = [{"score": float(s), "mask_id": i} for i, s in enumerate(scores)]
    want = sorted(layer.instance_nms(inst, iou))

    keep = greedy_nms_from_iou(
        jnp.asarray(iou), jnp.asarray(scores), PARAMS.nms_thr
    )
    got = sorted(np.nonzero(np.asarray(keep))[0].tolist())
    assert got == want


def test_instance_nms_parity_threshold_ties(ref_heads):
    """IoU entries exactly at nms_thr must suppress (`iou < thr` keeps,
    heads.py:251), and equal scores resolve in original order (python
    sorted() is stable; so is jnp.argsort)."""
    thr = PARAMS.nms_thr
    n = 6
    iou = np.eye(n, dtype=np.float32)
    iou[0, 1] = iou[1, 0] = thr          # exactly at threshold: suppress
    iou[2, 3] = iou[3, 2] = thr - 1e-3   # just below: keep
    iou[0, 4] = iou[4, 0] = 0.9          # suppressed by 0
    scores = np.array([0.9, 0.5, 0.7, 0.7, 0.8, 0.7], np.float32)  # 2,3,5 tie
    iou[2, 5] = iou[5, 2] = 0.95         # 5 suppressed by earlier tied 2

    layer = _ref_layer(ref_heads)
    inst = [{"score": float(s), "mask_id": i} for i, s in enumerate(scores)]
    want = sorted(layer.instance_nms(inst, iou))
    keep = greedy_nms_from_iou(jnp.asarray(iou), jnp.asarray(scores), thr)
    got = sorted(np.nonzero(np.asarray(keep))[0].tolist())
    assert got == want == [0, 2, 3]


# --------------------------------------------------------------------------- #
# Losses (heads.py:10-166)
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mil_bag_loss_parity(ref_heads, seed):
    rng = np.random.RandomState(seed)
    cls, det, labels, _, _, _ = _instance(rng)
    n = cls.shape[0]
    want = float(
        ref_heads.mil_bag_loss(
            torch.from_numpy(cls), torch.from_numpy(det),
            torch.from_numpy(labels)[None, :],
        )
    )
    pad = 13
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    got = float(
        L.mil_bag_loss(
            jnp.asarray(_pad_rows(cls, pad, 0.3)),
            jnp.asarray(_pad_rows(det, pad, 0.3)),
            jnp.asarray(labels), jnp.asarray(valid),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _mat(rng, n, c, n_clusters=4, with_bg=True):
    mat = np.zeros((n, c + 1), np.int32)
    next_id = 1
    for _ in range(n_clusters):
        rows = rng.choice(n, rng.randint(2, 6), replace=False)
        mat[rows, rng.randint(1, c + 1)] = next_id
        next_id += 1
    if with_bg:
        mat[rng.choice(n, rng.randint(2, 6), replace=False), 0] = next_id
    return mat


@pytest.mark.parametrize("with_bg", [True, False])
@pytest.mark.parametrize("seed", [0, 1])
def test_pcl_loss_parity(ref_heads, seed, with_bg):
    rng = np.random.RandomState(seed)
    cls, _, labels, _, _, _ = _instance(rng)
    n, c = cls.shape[0], labels.shape[0]
    mat = _mat(rng, n, c, with_bg=with_bg)
    with _cpu_cuda():
        want = float(
            ref_heads.PCL_loss(
                torch.from_numpy(cls), torch.from_numpy(mat),
                torch.from_numpy(labels)[None, :],
            )
        )
    pad = 9
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    got = float(
        L.pcl_loss(
            jnp.asarray(_pad_rows(cls, pad, 0.3)),
            jnp.asarray(_pad_rows(mat, pad, 2)),  # nonzero padding ids: masked
            jnp.asarray(labels), jnp.asarray(valid),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("agnostic", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_cls_iou_loss_parity(ref_heads, seed, agnostic):
    """Feed the reference loss mined labels produced by the reference layer
    itself, so the whole (mining -> loss) path is compared end to end."""
    rng = np.random.RandomState(seed)
    cls, det, labels, iou, asy, rois = _instance(rng, agnostic=agnostic)
    n = cls.shape[0]
    layer = _ref_layer(ref_heads)
    pl, pil, lw = layer(
        torch.from_numpy(cls), torch.from_numpy(det), torch.from_numpy(rois),
        torch.from_numpy(labels)[None, :], torch.from_numpy(iou),
        torch.from_numpy(asy), using_CIM=True,
    )
    assert pl is not None
    iou_score = rng.rand(n, 1 if agnostic else cls.shape[1]).astype(np.float32)
    want = ref_heads.cls_iou_loss(
        torch.from_numpy(cls), torch.from_numpy(iou_score), pl, pil, lw,
        torch.from_numpy(labels)[None, :],
    )
    pad = 11
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    got = L.cls_iou_loss(
        jnp.asarray(_pad_rows(cls, pad, 0.4)),
        jnp.asarray(_pad_rows(iou_score, pad, 0.4)),
        jnp.asarray(_pad_rows(pl.numpy(), pad)),
        jnp.asarray(_pad_rows(pil.numpy(), pad)),
        jnp.asarray(_pad_rows(lw.numpy(), pad)),
        jnp.asarray(labels), jnp.asarray(valid),
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(float(g), float(w), rtol=1e-4, atol=1e-6)


# --------------------------------------------------------------------------- #
# CIM_label / MIST_label (heads.py:260-407)
# --------------------------------------------------------------------------- #


def _dense_ref_mined(n, c, gt_labels, gt_weights, gt_idxs):
    """Scatter the reference's filtered gt rows back to dense (N, ...)."""
    lab = np.zeros((n, c + 1), np.float32)
    w = np.full((n,), -1.0, np.float32)
    idx = np.nonzero(gt_idxs.numpy())[0]
    lab[idx] = gt_labels.numpy()
    w[idx] = gt_weights.numpy()
    return lab, w


@pytest.mark.parametrize("c,n_labels", [(20, 3), (80, 6)])
@pytest.mark.parametrize("agnostic", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_cim_label_parity(ref_heads, seed, agnostic, c, n_labels):
    rng = np.random.RandomState(seed)
    cls, det, labels, iou, asy, rois = _instance(
        rng, n=50, c=c, n_labels=n_labels, agnostic=agnostic
    )
    n = cls.shape[0]
    layer = _ref_layer(ref_heads)
    gt_boxes, gt_labels, gt_weights, gt_idxs, flag = layer.CIM_label(
        torch.from_numpy(cls), torch.from_numpy(det),
        torch.from_numpy(rois[:, 1:]), torch.from_numpy(labels)[None, :],
        torch.from_numpy(iou), torch.from_numpy(asy),
    )
    want_lab, want_w = _dense_ref_mined(n, c, gt_labels, gt_weights, gt_idxs)

    pad = 17
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    got = cim_mine(
        jnp.asarray(_pad_rows(cls[:, 1:], pad)),
        jnp.asarray(_pad_rows(det[:, 1:] if not agnostic else det, pad)),
        jnp.asarray(labels),
        jnp.asarray(_pad2(iou, pad)),
        jnp.asarray(_pad2(asy, pad)),
        jnp.asarray(valid),
        PARAMS,
    )
    np.testing.assert_array_equal(
        np.asarray(got.gt_mask)[:n], gt_idxs.numpy().astype(bool)
    )
    np.testing.assert_allclose(np.asarray(got.gt_labels)[:n], want_lab, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.gt_weights)[:n], want_w, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(got.asy_iou_flag)[:n], flag.numpy().reshape(-1).astype(bool)
    )
    assert not np.asarray(got.gt_mask)[n:].any()


@pytest.mark.parametrize("seed", [0, 1])
def test_mist_label_parity(ref_heads, seed):
    rng = np.random.RandomState(seed)
    cls, det, labels, iou, asy, rois = _instance(rng, n=50)
    n, c = cls.shape[0], labels.shape[0]
    preds = cls * det
    layer = _ref_layer(ref_heads)
    gt_boxes, gt_labels, gt_weights, gt_idxs = layer.MIST_label(
        torch.from_numpy(preds), torch.from_numpy(rois[:, 1:]),
        torch.from_numpy(labels)[None, :], torch.from_numpy(iou),
    )
    want_lab, want_w = _dense_ref_mined(n, c, gt_labels, gt_weights, gt_idxs)

    pad = 8
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    got = mist_mine(
        jnp.asarray(_pad_rows(preds[:, 1:], pad)),
        jnp.asarray(labels),
        jnp.asarray(_pad2(iou, pad)),
        jnp.asarray(valid),
        PARAMS,
    )
    np.testing.assert_array_equal(
        np.asarray(got.gt_mask)[:n], gt_idxs.numpy().astype(bool)
    )
    np.testing.assert_allclose(np.asarray(got.gt_labels)[:n], want_lab, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.gt_weights)[:n], want_w, rtol=1e-5, atol=1e-6
    )


# --------------------------------------------------------------------------- #
# CIM_layer.forward (heads.py:409-502), anti-noise off
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("c,n_labels", [(20, 3), (80, 6)])
@pytest.mark.parametrize("agnostic", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_forward_parity(ref_heads, seed, agnostic, c, n_labels):
    rng = np.random.RandomState(seed)
    cls, det, labels, iou, asy, rois = _instance(
        rng, n=50, c=c, n_labels=n_labels, agnostic=agnostic
    )
    n = cls.shape[0]
    layer = _ref_layer(ref_heads, anti_noise=False)
    pl, pil, lw = layer(
        torch.from_numpy(cls), torch.from_numpy(det), torch.from_numpy(rois),
        torch.from_numpy(labels)[None, :], torch.from_numpy(iou),
        torch.from_numpy(asy), using_CIM=True,
    )
    assert pl is not None

    pad = 17
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    got = cim_layer(
        jnp.asarray(_pad_rows(cls, pad, 0.2)),
        jnp.asarray(_pad_rows(det, pad, 0.2)),
        jnp.asarray(labels),
        jnp.asarray(_pad2(iou, pad)),
        jnp.asarray(_pad2(asy, pad)),
        jnp.asarray(valid),
        PARAMS,
        jax.random.PRNGKey(0),
    )
    assert bool(got.has_gt)
    np.testing.assert_allclose(
        np.asarray(got.pseudo_labels)[:n], pl.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.pseudo_iou_labels)[:n], pil.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.loss_weights)[:n], lw.numpy(), rtol=1e-5, atol=1e-6
    )
    # padded rows contribute nothing downstream
    assert not np.asarray(got.pseudo_labels)[n:].any()
    assert not np.asarray(got.loss_weights)[n:].any()


def test_forward_none_on_all_big_proposals(ref_heads):
    """When every proposal is 'big' (contains > 90% of the others) nothing is
    mined and the reference returns (None, None, None) (heads.py:429-430);
    cim_tpu signals the same via has_gt=False."""
    rng = np.random.RandomState(0)
    cls, det, labels, _, _, rois = _instance(rng, n=30)
    n = cls.shape[0]
    iou = np.ones((n, n), np.float32)
    asy = np.ones((n, n), np.float32)  # everyone contains everyone
    layer = _ref_layer(ref_heads, anti_noise=False)
    pl, pil, lw = layer(
        torch.from_numpy(cls), torch.from_numpy(det), torch.from_numpy(rois),
        torch.from_numpy(labels)[None, :], torch.from_numpy(iou),
        torch.from_numpy(asy), using_CIM=True,
    )
    assert pl is None and pil is None and lw is None

    got = cim_layer(
        jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
        jnp.asarray(iou), jnp.asarray(asy), jnp.ones(n, bool),
        PARAMS, jax.random.PRNGKey(0),
    )
    assert not bool(got.has_gt)
    assert int(got.gt_count) == 0


@pytest.mark.parametrize("k", [0, 1, 2])
def test_forward_parity_branch_thresholds(ref_heads, k):
    """The per-branch threshold ramp (model_builder.py:90-94):
    cls_thr = 0.25 + 0.1k, iou_thr = 0.5 + 0.1k, nms_thr = cls_thr."""
    rng = np.random.RandomState(7 + k)
    cls, det, labels, iou, asy, rois = _instance(rng, n=40)
    n = cls.shape[0]
    params = MiningParams(
        p_seed=0.1, cls_thr=0.25 + 0.1 * k, iou_thr=0.5 + 0.1 * k,
        con_thr=0.85, anti_noise=False,
    )
    layer = ref_heads.CIM_layer(
        p_seed=params.p_seed, cls_thr=params.cls_thr, iou_thr=params.iou_thr,
        con_thr=params.con_thr, Anti_noise_sampling=False,
    )
    pl, pil, lw = layer(
        torch.from_numpy(cls), torch.from_numpy(det), torch.from_numpy(rois),
        torch.from_numpy(labels)[None, :], torch.from_numpy(iou),
        torch.from_numpy(asy), using_CIM=True,
    )
    assert pl is not None
    got = cim_layer(
        jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
        jnp.asarray(iou), jnp.asarray(asy), jnp.ones(n, bool),
        params, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(got.pseudo_labels), pl.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.pseudo_iou_labels), pil.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.loss_weights), lw.numpy(), rtol=1e-5, atol=1e-6
    )


def test_forward_anti_noise_distributional_parity(ref_heads):
    """The one stochastic path: Anti_noise_sampling. The reference draws
    numpy choice-with-replacement then unique per class (heads.py:452-466);
    ours is CDF inversion over the jax PRNG (cim.py:anti_noise_resample) —
    the same categorical distribution by construction, pinned here
    EMPIRICALLY against the *executed* reference: over R independent
    trials, each proposal's foreground-assignment frequency and mean loss
    weight agree within sampling noise. A wrong weighting, a
    wrong-universe resample, or a biased survivor rule shifts these
    frequencies far beyond the tolerance."""
    rng = np.random.RandomState(3)
    cls, det, labels, iou, asy, rois = _instance(rng, n=40, n_labels=2)
    n = cls.shape[0]
    params = MiningParams(p_seed=0.1, cls_thr=0.25, iou_thr=0.5,
                          con_thr=0.85, anti_noise=True)
    layer = _ref_layer(ref_heads, anti_noise=True)

    R = 300
    ref_fg = np.zeros(n)
    ref_w = np.zeros(n)
    for t in range(R):
        np.random.seed(10_000 + t)
        pl, pil, lw = layer(
            torch.from_numpy(cls), torch.from_numpy(det),
            torch.from_numpy(rois), torch.from_numpy(labels)[None, :],
            torch.from_numpy(iou), torch.from_numpy(asy), using_CIM=True,
        )
        ref_fg += (pl.numpy()[:, 1:].sum(-1) > 0).astype(np.float64)
        ref_w += lw.numpy()
    ref_fg /= R
    ref_w /= R

    import functools

    jitted = jax.jit(functools.partial(cim_layer, params=params))
    args = (jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
            jnp.asarray(iou), jnp.asarray(asy), jnp.ones(n, bool))
    our_fg = np.zeros(n)
    our_w = np.zeros(n)
    for t in range(R):
        got = jitted(*args, rng_key=jax.random.PRNGKey(t))
        pl_j = np.asarray(got.pseudo_labels)
        our_fg += (pl_j[:, 1:].sum(-1) > 0).astype(np.float64)
        our_w += np.asarray(got.loss_weights)
    our_fg /= R
    our_w /= R

    # the fixture must actually be stochastic (assignments vary)
    varying = (ref_fg > 0.02) & (ref_fg < 0.98)
    assert varying.sum() >= 3, f"fixture not stochastic: {ref_fg}"

    # per-proposal: two independent binomial estimates, sd <= ~0.041 at
    # R=300 -> 4.5 sigma combined ~ 0.26; mean-abs over proposals is the
    # sharp statistic (noise averages down across n)
    np.testing.assert_array_less(np.abs(our_fg - ref_fg), 0.26)
    assert np.mean(np.abs(our_fg - ref_fg)) < 0.035
    assert np.mean(np.abs(our_w - ref_w)) < 0.035
