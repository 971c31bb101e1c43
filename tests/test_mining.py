import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cim_tpu.mining.cim import (
    MinedGT,
    MiningParams,
    anti_noise_resample,
    assign_pseudo_labels,
    cim_layer,
    cim_mine,
    mist_mine,
)
from tests import oracle_cim


def _make_instance(rng, n=60, c=20, n_labels=3, agnostic=False):
    """Random but realistic CIM inputs: scores softmax-ish, consistent
    iou/asy matrices from random masks."""
    masks = rng.rand(n, 14, 14) > rng.uniform(0.4, 0.7)
    flat = masks.reshape(n, -1).astype(np.float64)
    inter = flat @ flat.T
    area = flat.sum(-1)
    union = area[:, None] + area[None, :] - inter
    iou = (inter / np.maximum(union, 1)).astype(np.float32)
    asy = (inter / np.maximum(area[None, :], 1)).astype(np.float32)

    cls = rng.dirichlet(np.ones(c), size=n).astype(np.float32)
    if agnostic:
        det = rng.rand(n, 1).astype(np.float32)
        det /= det.sum()
    else:
        det = rng.dirichlet(np.ones(n), size=c).T.astype(np.float32).copy()
    labels = np.zeros(c, np.float32)
    labels[rng.choice(c, n_labels, replace=False)] = 1
    return cls, det, labels, iou, asy


def _pad(x, pad_n, fill=0.0):
    pad_width = [(0, pad_n)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad_width, constant_values=fill)


def _pad2(m, pad_n):
    return np.pad(m, [(0, pad_n), (0, pad_n)], constant_values=0.0)


@pytest.mark.parametrize("agnostic", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cim_mine_matches_oracle(seed, agnostic):
    rng = np.random.RandomState(seed)
    cls, det, labels, iou, asy = _make_instance(rng, agnostic=agnostic)
    n = cls.shape[0]
    params = MiningParams(p_seed=0.1, cls_thr=0.25, iou_thr=0.5, con_thr=0.85)

    want_lab, want_w, want_idx, want_flag = oracle_cim.cim_label(
        cls, det, labels, iou, asy, params.p_seed, params.nms_thr, params.con_thr
    )

    pad = 17
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    got = cim_mine(
        jnp.asarray(_pad(cls, pad)),
        jnp.asarray(_pad(det, pad)),
        jnp.asarray(labels),
        jnp.asarray(_pad2(iou, pad)),
        jnp.asarray(_pad2(asy, pad)),
        jnp.asarray(valid),
        params,
    )
    np.testing.assert_allclose(np.asarray(got.gt_labels)[:n], want_lab, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.gt_weights)[:n], want_w, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.gt_mask)[:n], want_idx)
    np.testing.assert_array_equal(np.asarray(got.asy_iou_flag)[:n], want_flag)
    # padding never mined
    assert not np.asarray(got.gt_mask)[n:].any()


@pytest.mark.parametrize("seed", [0, 3])
def test_assignment_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    cls, det, labels, iou, asy = _make_instance(rng)
    n = cls.shape[0]
    params = MiningParams(p_seed=0.1, cls_thr=0.35, iou_thr=0.6, con_thr=0.85)

    glab, gw, gidx, gflag = oracle_cim.cim_label(
        cls, det, labels, iou, asy, params.p_seed, params.nms_thr, params.con_thr
    )
    want = oracle_cim.assign_forward(glab, gw, gidx, gflag, iou, params.cls_thr, params.iou_thr)

    pad = 9
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    mined = MinedGT(
        jnp.asarray(_pad(glab, pad)),
        jnp.asarray(_pad(gw, pad, fill=-1.0)),
        jnp.asarray(_pad(gidx, pad, fill=False)),
        jnp.asarray(_pad(gflag, pad, fill=False)),
    )
    got = assign_pseudo_labels(mined, jnp.asarray(_pad2(iou, pad)), jnp.asarray(valid), params)

    if want[0] is None:
        assert not bool(got.has_gt)
        return
    assert bool(got.has_gt)
    np.testing.assert_allclose(np.asarray(got.pseudo_labels)[:n], want[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.pseudo_iou_labels)[:n], want[1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.loss_weights)[:n], want[2], rtol=1e-5, atol=1e-6)
    # padding rows fully zeroed
    assert np.abs(np.asarray(got.pseudo_labels)[n:]).sum() == 0


def test_cim_layer_strips_background_column(rng):
    cls, det, labels, iou, asy = _make_instance(rng)
    n, c = cls.shape
    # add bg column -> (N, C+1); cim_layer must strip it (heads.py:327-328)
    cls_bg = np.concatenate([rng.rand(n, 1).astype(np.float32), cls], 1)
    det_bg = np.concatenate([rng.rand(n, 1).astype(np.float32), det], 1)
    params = MiningParams(anti_noise=False)
    out_bg = cim_layer(
        jnp.asarray(cls_bg), jnp.asarray(det_bg), jnp.asarray(labels),
        jnp.asarray(iou), jnp.asarray(asy), jnp.ones(n, bool), params,
        jax.random.PRNGKey(0),
    )
    out = cim_layer(
        jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
        jnp.asarray(iou), jnp.asarray(asy), jnp.ones(n, bool), params,
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(out_bg.pseudo_labels), np.asarray(out.pseudo_labels)
    )


def test_mist_mine_basic(rng):
    cls, det, labels, iou, asy = _make_instance(rng)
    n = cls.shape[0]
    params = MiningParams()
    mined = mist_mine(
        jnp.asarray(cls * det), jnp.asarray(labels), jnp.asarray(iou),
        jnp.ones(n, bool), params,
    )
    got_mask = np.asarray(mined.gt_mask)
    assert got_mask.any()
    # mined rows carry exactly one fg label of a present class
    glab = np.asarray(mined.gt_labels)
    assert (glab[got_mask].sum(-1) == 1).all()
    mined_classes = np.nonzero(glab[:, 1:].sum(0))[0]
    assert set(mined_classes).issubset(set(np.nonzero(labels)[0]))


def test_anti_noise_resample_properties(rng):
    cls, det, labels, iou, asy = _make_instance(rng, n_labels=2)
    n = cls.shape[0]
    params = MiningParams()
    mined = cim_mine(
        jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
        jnp.asarray(iou), jnp.asarray(asy), jnp.ones(n, bool), params,
    )
    before = np.asarray(mined.gt_mask)
    out = anti_noise_resample(mined, jnp.asarray(labels), jax.random.PRNGKey(7))
    after = np.asarray(out.gt_mask)
    # sampling with replacement can only shrink (unique of draws ⊆ members)
    assert (after <= before).all()
    assert after.sum() >= 1
    # weights/labels cleared exactly on dropped rows
    assert (np.asarray(out.gt_weights)[~after] == -1).all()
    assert np.abs(np.asarray(out.gt_labels)[~after]).sum() == 0

    # highest-weight member of each class should survive with high probability
    # across seeds (it is drawn with the largest probability each of n_c draws)
    survived = 0
    trials = 20
    glab = np.asarray(mined.gt_labels)
    gw = np.asarray(mined.gt_weights)
    for s in range(trials):
        o = anti_noise_resample(mined, jnp.asarray(labels), jax.random.PRNGKey(s))
        m = np.asarray(o.gt_mask)
        for c in np.nonzero(labels)[0]:
            members = np.nonzero(glab[:, c + 1] == 1)[0]
            if len(members) == 0:
                continue
            top = members[np.argmax(gw[members])]
            survived += bool(m[top])
    assert survived > 0.5 * trials  # loose sanity: top member usually kept


def test_cim_mine_coco_label_space(rng):
    """C=80 (COCO) path matches the oracle too (heads.py asserts 20/80)."""
    cls, det, labels, iou, asy = _make_instance(rng, n=40, c=80, n_labels=5)
    params = MiningParams()
    want_lab, want_w, want_idx, want_flag = oracle_cim.cim_label(
        cls, det, labels, iou, asy, params.p_seed, params.nms_thr, params.con_thr
    )
    got = cim_mine(
        jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
        jnp.asarray(iou), jnp.asarray(asy), jnp.ones(40, bool), params,
    )
    np.testing.assert_allclose(np.asarray(got.gt_labels), want_lab, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.gt_mask), want_idx)


def test_class_tie_goes_to_lowest_class():
    """Two labeled classes mine the SAME proposal with exactly equal
    cls*det scores: the reference iterates classes ascending with a strict
    `>` update (heads.py:397-402), so the LOWEST class index keeps it.
    Guards the argmax-first-max winner reduction that replaced the
    sequential class scan (cim_tpu/mining/cim.py:_winner_reduce)."""
    n, c = 4, 10
    cls = np.zeros((n, c), np.float32)
    det = np.zeros((n, c), np.float32)
    for k in (3, 7):
        cls[0, k] = 0.5
        det[0, k] = 0.4
        cls[1, k] = 0.1
        det[1, k] = 0.1
    labels = np.zeros(c, np.float32)
    labels[[3, 7]] = 1
    iou = np.eye(n, dtype=np.float32)
    asy = np.eye(n, dtype=np.float32)
    params = MiningParams(p_seed=0.1)  # ceil(0.1*4) = 1 seed per class

    want_lab, want_w, _, _ = oracle_cim.cim_label(
        cls, det, labels, iou, asy, params.p_seed, params.nms_thr, params.con_thr
    )
    assert want_lab[0, 3 + 1] == 1 and want_lab[0, 7 + 1] == 0  # oracle sanity

    got = cim_mine(
        jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
        jnp.asarray(iou), jnp.asarray(asy), jnp.ones(n, bool), params,
    )
    np.testing.assert_allclose(np.asarray(got.gt_labels), want_lab, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.gt_weights), want_w, atol=1e-6)

    got_mist = mist_mine(
        jnp.asarray(cls * det), jnp.asarray(labels), jnp.asarray(iou),
        jnp.ones(n, bool), params,
    )
    glab = np.asarray(got_mist.gt_labels)
    assert glab[0, 3 + 1] == 1 and glab[0, 7 + 1] == 0


@pytest.mark.parametrize("c", [33, 40, 64, 80])
def test_chunked_class_map_matches_oracle(c):
    """Class counts above the _CLASS_CHUNK bound run through the padded
    lax.map path; every pad remainder (31, 24, 0, 16) must be invisible."""
    rng = np.random.RandomState(c)
    cls, det, labels, iou, asy = _make_instance(rng, n=50, c=c, n_labels=6)
    params = MiningParams()
    want_lab, want_w, want_idx, _ = oracle_cim.cim_label(
        cls, det, labels, iou, asy, params.p_seed, params.nms_thr, params.con_thr
    )
    got = cim_mine(
        jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
        jnp.asarray(iou), jnp.asarray(asy), jnp.ones(50, bool), params,
    )
    np.testing.assert_allclose(np.asarray(got.gt_labels), want_lab, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.gt_weights), want_w, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(got.gt_mask), want_idx)


@pytest.mark.parametrize("seed", list(range(8)))
@pytest.mark.parametrize("miner", ["cim", "mist"])
def test_per_class_mined_count_bounded_by_max_seeds(seed, miner):
    """anti_noise_resample(max_draws=max_seeds(p_seed, n)) silently
    under-draws if any class ever mines more rows than the seed count. The
    bound holds because cim_mine/mist_mine pick rows only from (at most)
    k_seed seed columns — but that is a cross-module assumption; this test
    makes a future mining change that breaks it fail loudly instead of
    quietly skewing the resampling distribution (see cim_layer's max_draws
    plumbing, cim_tpu/mining/cim.py)."""
    from cim_tpu.mining.cim import max_seeds

    rng = np.random.RandomState(100 + seed)
    n = int(rng.randint(20, 120))
    cls, det, labels, iou, asy = _make_instance(
        rng, n=n, c=20, n_labels=int(rng.randint(1, 6))
    )
    params = MiningParams(p_seed=0.1)
    if miner == "cim":
        mined = cim_mine(
            jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
            jnp.asarray(iou), jnp.asarray(asy), jnp.ones(n, bool), params,
        )
    else:
        mined = mist_mine(
            jnp.asarray(cls * det), jnp.asarray(labels), jnp.asarray(iou),
            jnp.ones(n, bool), params,
        )
    per_class = np.asarray(mined.gt_labels)[:, 1:].sum(axis=0)
    assert per_class.max() <= max_seeds(params.p_seed, n)


# ----------------------------- class budget ------------------------------ #

@pytest.mark.parametrize("miner", ["cim", "mist"])
@pytest.mark.parametrize("c,budget,n_labels", [
    (20, 8, 3), (20, 8, 8), (20, 4, 1), (80, 16, 3), (80, 16, 16),
])
@pytest.mark.parametrize("seed", [0, 1])
def test_class_budget_exact_when_labels_fit(miner, c, budget, n_labels, seed):
    """TPU.MINING_CLASS_BUDGET: mining a present-first static selection of
    `budget` classes is BIT-identical to mining all C whenever the image
    has <= budget label classes (the reference itself only mines
    labels.nonzero(), heads.py:341 — the budget is the fixed-shape form
    of that restriction)."""
    rng = np.random.RandomState(seed)
    cls, det, labels, iou, asy = _make_instance(rng, n=50, c=c,
                                                n_labels=n_labels)
    valid = np.ones(50, bool)
    full = MiningParams(p_seed=0.1, cls_thr=0.25, iou_thr=0.5, con_thr=0.85)
    budgeted = full._replace(class_budget=budget)

    if miner == "cim":
        a = cim_mine(jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
                     jnp.asarray(iou), jnp.asarray(asy), jnp.asarray(valid),
                     full)
        b = cim_mine(jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
                     jnp.asarray(iou), jnp.asarray(asy), jnp.asarray(valid),
                     budgeted)
    else:
        preds = cls * det
        a = mist_mine(jnp.asarray(preds), jnp.asarray(labels),
                      jnp.asarray(iou), jnp.asarray(valid), full)
        b = mist_mine(jnp.asarray(preds), jnp.asarray(labels),
                      jnp.asarray(iou), jnp.asarray(valid), budgeted)
    for fa, fb, name in zip(a, b, MinedGT._fields):
        np.testing.assert_array_equal(
            np.asarray(fa), np.asarray(fb), err_msg=f"{miner}:{name}"
        )


def test_class_budget_tie_to_lowest_original_class():
    """Equal winner scores across two label classes must still resolve to
    the LOWEST original class index under a budget (ascending-order
    strict-'>' of the reference)."""
    n, c = 8, 20
    iou = np.eye(n, dtype=np.float32)
    asy = np.eye(n, dtype=np.float32)
    cls = np.zeros((n, c), np.float32)
    det = np.full((n, c), 0.5, np.float32)
    labels = np.zeros(c, np.float32)
    labels[[5, 11]] = 1  # two present classes, identical scores
    cls[:, 5] = 0.4
    cls[:, 11] = 0.4
    full = MiningParams(p_seed=0.5, cls_thr=0.25, iou_thr=0.5, con_thr=0.85)
    got = cim_mine(jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
                   jnp.asarray(iou), jnp.asarray(asy),
                   jnp.ones(n, bool), full._replace(class_budget=4))
    ref = cim_mine(jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
                   jnp.asarray(iou), jnp.asarray(asy),
                   jnp.ones(n, bool), full)
    np.testing.assert_array_equal(np.asarray(got.gt_labels),
                                  np.asarray(ref.gt_labels))
    mined_rows = np.asarray(got.gt_mask)
    assert mined_rows.any()
    # winner column is class 5+1 (lowest present class), never 11+1
    assert np.asarray(got.gt_labels)[mined_rows, 6].all()


def test_loader_rejects_label_count_over_budget():
    from cim_tpu.config import clone_cfg, get_default_cfg
    from cim_tpu.data.loader import build_microbatch

    cfg = clone_cfg(get_default_cfg())
    cfg.MODEL.NUM_CLASSES = 20
    cfg.TPU.MINING_CLASS_BUDGET = 2
    cfg.TPU.PROPOSAL_PAD = 8
    rng = np.random.RandomState(0)
    gt = np.zeros(20, np.float32)
    gt[[1, 4, 9]] = 1  # 3 labels > budget 2
    entry = {
        "image": "x.jpg", "height": 32, "width": 32, "flipped": False,
        "boxes": rng.rand(4, 4).astype(np.float32) * 16,
        "masks": (rng.rand(4, 7, 7) > 0.5).astype(np.float32),
        "mat": np.zeros((4, 21), np.float32),
        "gt_classes": gt,
        "iou_map": np.eye(4, dtype=np.float16),
        "asy_iou_map": np.eye(4, dtype=np.float16),
    }
    with pytest.raises(ValueError, match="MINING_CLASS_BUDGET"):
        build_microbatch(
            cfg, entry, 1.0, (32, 32), rng,
            image=(rng.rand(32, 32, 3) * 255).astype(np.uint8),
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_class_budget_exact_class_agnostic_det(seed):
    """Budgeted mining with the class-agnostic (N, 1) detector head
    (VGG configs): identical to full mining."""
    rng = np.random.RandomState(seed)
    cls, det, labels, iou, asy = _make_instance(rng, n=40, c=20, n_labels=3,
                                                agnostic=True)
    valid = np.ones(40, bool)
    full = MiningParams(p_seed=0.1, cls_thr=0.25, iou_thr=0.5, con_thr=0.85)
    a = cim_mine(jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
                 jnp.asarray(iou), jnp.asarray(asy), jnp.asarray(valid), full)
    b = cim_mine(jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels),
                 jnp.asarray(iou), jnp.asarray(asy), jnp.asarray(valid),
                 full._replace(class_budget=6))
    for fa, fb, name in zip(a, b, MinedGT._fields):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb),
                                      err_msg=name)
