import numpy as np
import jax.numpy as jnp
import pytest

from cim_tpu.mining import losses as L
from tests import oracle_cim


def _case(rng, n=40, c=20):
    cls = rng.dirichlet(np.ones(c + 1), size=n).astype(np.float32)
    det = rng.dirichlet(np.ones(n), size=c + 1).T.astype(np.float32).copy()
    iou = rng.rand(n, c + 1).astype(np.float32)
    labels = np.zeros(c, np.float32)
    labels[rng.choice(c, 3, replace=False)] = 1
    # pseudo labels: one-hot rows for some proposals, zero rows for ignored
    pl = np.zeros((n, c + 1), np.float32)
    pres = np.concatenate([[0], np.nonzero(labels)[0] + 1])
    for i in range(n):
        r = rng.rand()
        if r < 0.5:
            pl[i, rng.choice(pres)] = 1
    pil = (rng.rand(n) > 0.5).astype(np.float32)
    lw = rng.rand(n).astype(np.float32) * (pl.sum(-1) > 0)
    return cls, det, iou, labels, pl, pil, lw


def test_mil_bag_loss_matches_oracle(rng):
    cls, det, _, labels, *_ = _case(rng)
    n = cls.shape[0]
    got = float(
        L.mil_bag_loss(jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels), jnp.ones(n, bool))
    )
    want = oracle_cim.mil_bag_loss(cls, det, labels)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mil_bag_loss_padding_invariance(rng):
    cls, det, _, labels, *_ = _case(rng)
    n = cls.shape[0]
    base = float(
        L.mil_bag_loss(jnp.asarray(cls), jnp.asarray(det), jnp.asarray(labels), jnp.ones(n, bool))
    )
    pad = 13
    cls_p = np.concatenate([cls, rng.rand(pad, cls.shape[1]).astype(np.float32)])
    det_p = np.concatenate([det, rng.rand(pad, det.shape[1]).astype(np.float32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    padded = float(
        L.mil_bag_loss(jnp.asarray(cls_p), jnp.asarray(det_p), jnp.asarray(labels), jnp.asarray(valid))
    )
    np.testing.assert_allclose(padded, base, rtol=1e-6)


@pytest.mark.parametrize("agnostic", [False, True])
def test_cls_iou_loss_matches_oracle(rng, agnostic):
    cls, det, iou, labels, pl, pil, lw = _case(rng)
    n = cls.shape[0]
    if agnostic:
        iou = iou[:, :1].copy()
    got = L.cls_iou_loss(
        jnp.asarray(cls), jnp.asarray(iou), jnp.asarray(pl), jnp.asarray(pil),
        jnp.asarray(lw), jnp.asarray(labels), jnp.ones(n, bool),
    )
    want = oracle_cim.cls_iou_loss(cls, iou, pl, pil, lw, labels)
    for g, w in zip(got, want):
        np.testing.assert_allclose(float(g), w, rtol=1e-4, atol=1e-6)


def test_cls_iou_loss_padding_invariance(rng):
    cls, det, iou, labels, pl, pil, lw = _case(rng)
    n = cls.shape[0]
    base = L.cls_iou_loss(
        jnp.asarray(cls), jnp.asarray(iou), jnp.asarray(pl), jnp.asarray(pil),
        jnp.asarray(lw), jnp.asarray(labels), jnp.ones(n, bool),
    )
    pad = 7
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])

    def padrows(x, fill=0.0):
        return np.concatenate([x, np.full((pad,) + x.shape[1:], fill, x.dtype)])

    # padding rows get zero pseudo labels / weights (as the pipeline emits)
    padded = L.cls_iou_loss(
        jnp.asarray(padrows(cls, 0.5)), jnp.asarray(padrows(iou, 0.5)),
        jnp.asarray(padrows(pl)), jnp.asarray(padrows(pil)),
        jnp.asarray(padrows(lw)), jnp.asarray(labels), jnp.asarray(valid),
    )
    for g, w in zip(padded, base):
        np.testing.assert_allclose(float(g), float(w), rtol=1e-5, atol=1e-6)


def test_no_mined_rows_gives_zero_cls_iou(rng):
    cls, det, iou, labels, pl, pil, lw = _case(rng)
    n = cls.shape[0]
    zero_pl = np.zeros_like(pl)
    cls_l, iou_l, bag = L.cls_iou_loss(
        jnp.asarray(cls), jnp.asarray(iou), jnp.asarray(zero_pl), jnp.asarray(pil),
        jnp.asarray(np.zeros_like(lw)), jnp.asarray(labels), jnp.ones(n, bool),
    )
    assert float(cls_l) == 0.0
    assert float(iou_l) == 0.0
    assert np.isfinite(float(bag))


def _make_mat(rng, n, c, n_clusters=4, with_bg=True):
    mat = np.zeros((n, c + 1), np.int32)
    next_id = 1
    for _ in range(n_clusters):
        rows = rng.choice(n, rng.randint(2, 6), replace=False)
        col = rng.randint(1, c + 1)
        mat[rows, col] = next_id
        next_id += 1
    if with_bg:
        rows = rng.choice(n, rng.randint(2, 6), replace=False)
        mat[rows, 0] = next_id
    return mat


@pytest.mark.parametrize("with_bg", [True, False])
def test_pcl_loss_matches_oracle(rng, with_bg):
    n, c = 50, 20
    cls = rng.dirichlet(np.ones(c + 1), size=n).astype(np.float32)
    labels = np.zeros(c, np.float32)
    mat = _make_mat(rng, n, c, with_bg=with_bg)
    got = float(
        L.pcl_loss(jnp.asarray(cls), jnp.asarray(mat), jnp.asarray(labels), jnp.ones(n, bool))
    )
    want = oracle_cim.pcl_loss(cls, mat, labels)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pcl_loss_padding_invariance(rng):
    n, c = 30, 20
    cls = rng.dirichlet(np.ones(c + 1), size=n).astype(np.float32)
    labels = np.zeros(c, np.float32)
    mat = _make_mat(rng, n, c)
    base = float(
        L.pcl_loss(jnp.asarray(cls), jnp.asarray(mat), jnp.asarray(labels), jnp.ones(n, bool))
    )
    pad = 11
    cls_p = np.concatenate([cls, rng.dirichlet(np.ones(c + 1), size=pad).astype(np.float32)])
    mat_p = np.concatenate([mat, rng.randint(0, 5, (pad, c + 1)).astype(np.int32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    padded = float(
        L.pcl_loss(jnp.asarray(cls_p), jnp.asarray(mat_p), jnp.asarray(labels), jnp.asarray(valid))
    )
    np.testing.assert_allclose(padded, base, rtol=1e-5)
