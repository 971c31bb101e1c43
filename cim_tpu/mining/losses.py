"""CIM losses as pure fixed-shape functions.

Semantics: reference lib/modeling/heads.py:10-166 (PCL_loss,
loss_weight_bag_loss, cls_iou_loss, mil_loss, mil_bag_loss). Every function
takes explicit validity masks instead of boolean indexing, so shapes stay
static under jit; excluded rows contribute exact zeros, matching the
reference's fancy-indexed reductions.

Shapes:
  predict_*: (N, C+1) proposal scores (column 0 = background)
  labels:    (C,) multi-hot image-level labels
  pseudo_labels: (N, C+1) one-hot (all-zero rows = ignored proposals)
  valid:     (N,) proposal validity (padding mask)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-6


def _clamp01(x):
    return jnp.clip(x, EPS, 1.0 - EPS)


def _bce(pred, target):
    pred = _clamp01(pred)
    return -(target * jnp.log(pred) + (1.0 - target) * jnp.log(1.0 - pred))


def smooth_l1(x, y):
    """torch.nn.functional.smooth_l1_loss(reduction='none'), beta=1."""
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def mil_bag_loss(predict_cls, predict_det, labels, valid):
    """WSDDN bag loss (reference heads.py:149-166).

    pred[c] = Σ_proposals cls·det; BCE against [1, labels] (bg column = 1).
    """
    pred = jnp.sum(
        predict_cls * predict_det * valid[:, None], axis=0, keepdims=True
    )
    pred = _clamp01(pred)
    label_tmp = jnp.concatenate(
        [jnp.ones((1, 1), labels.dtype), labels[None, :]], axis=1
    )
    return jnp.mean(_bce(pred, label_tmp))


def loss_weight_bag_loss(predict, pseudo_labels, label_tmp, loss_weight, valid):
    """Weighted bag loss over mined foreground + unseen classes
    (reference heads.py:43-74).

    predict: (N, C+1); label_tmp: (C+1,) with bg=1; loss_weight: (N,).
    """
    predict = predict * valid[:, None]
    ind = jnp.sum(pseudo_labels != 0, axis=-1) != 0  # (N,) fg/bg-mined rows
    tmp_pseudo = (pseudo_labels != 0).astype(predict.dtype)

    fg_scores = ind[:, None] * predict * tmp_pseudo
    fg_agg_value = jnp.max(fg_scores, axis=0)
    fg_agg_index = jnp.argmax(fg_scores, axis=0)
    unseen_agg_value = jnp.max(predict, axis=0)
    unseen_agg_index = jnp.argmax(predict, axis=0)

    aggression = fg_agg_value * label_tmp + unseen_agg_value * (1.0 - label_tmp)
    aggression = _clamp01(aggression)

    label_flag = label_tmp == 1
    agg_index = jnp.where(label_flag, fg_agg_index, unseen_agg_index)
    label_weight = jnp.where(label_flag, loss_weight[agg_index], 1.0)

    loss = _bce(aggression, label_tmp) * label_weight
    return jnp.mean(loss)


def cls_iou_loss(
    cls_score,
    iou_score,
    pseudo_labels,
    pseudo_iou_labels,
    loss_weights,
    labels,
    valid,
    del_iou_branch: bool = False,
):
    """Refinement-branch loss triple (reference heads.py:78-138).

    Returns (cls_loss, iou_loss, bag_loss). iou_score may be class-specific
    (N, C+1) or class-agnostic (N, 1).
    """
    cls_score = _clamp01(cls_score)
    iou_score = _clamp01(iou_score)
    label_tmp = jnp.concatenate([jnp.ones((1,), labels.dtype), labels])

    ind = (jnp.sum(pseudo_labels != 0, axis=-1) != 0) & valid  # mined rows

    if del_iou_branch:
        bag_loss = loss_weight_bag_loss(
            cls_score, pseudo_labels, label_tmp, loss_weights, valid
        )
    elif iou_score.shape[-1] == 1:
        op_score = jnp.concatenate(
            [cls_score[:, 0:1], cls_score[:, 1:] * iou_score], axis=1
        )
        bag_loss = loss_weight_bag_loss(
            op_score, pseudo_labels, label_tmp, loss_weights, valid
        )
    else:
        bag_loss = loss_weight_bag_loss(
            cls_score * iou_score, pseudo_labels, label_tmp, loss_weights, valid
        )

    onehot = (pseudo_labels != 0).astype(cls_score.dtype) * ind[:, None]
    n_mined = jnp.sum(onehot)

    # cls loss: weighted CE on mined rows
    ce = -onehot * jnp.log(cls_score) * loss_weights[:, None]
    cls_loss = jnp.where(n_mined > 0, jnp.sum(ce) / jnp.maximum(n_mined, 1.0), 0.0)

    # iou loss: smooth-L1 on foreground-mined rows only
    fg_ind = (jnp.sum(onehot[:, 1:], axis=-1) != 0)  # (N,)
    if iou_score.shape[-1] == pseudo_labels.shape[-1]:
        fg_iou_score = jnp.sum(onehot * iou_score, axis=-1)
    elif iou_score.shape[-1] == 1:
        fg_iou_score = iou_score[:, 0]
    else:
        raise NotImplementedError("Please check shape of fg_iou_score")
    l1 = smooth_l1(fg_iou_score, pseudo_iou_labels) * loss_weights * fg_ind
    n_fg = jnp.sum(onehot * fg_ind[:, None])
    iou_loss = jnp.where(n_fg > 0, jnp.sum(l1) / jnp.maximum(n_fg, 1.0), 0.0)

    return cls_loss, iou_loss, bag_loss


def pcl_loss(predict_cls, mat, labels, valid, max_clusters: int = 64):
    """PCL cluster loss (reference heads.py:10-41; arXiv:1807.03342).

    mat: (N, C+1) integer cluster-assignment matrix from the offline label
    assigner (0 = unassigned; the background cluster id appears in column 0).
    The reference iterates torch.unique(mat); here ALL cluster ids
    1..max_clusters are evaluated at once with presence masks (absent ids
    contribute exactly zero) — the per-cluster reductions batch into two
    matmuls over a (K, N) membership matrix instead of K sequential
    fori_loop rounds, whose fixed per-round latency dominated the loss
    time on TPU (the per-round tensors are only (N, C+1)).
    """
    del labels
    n, c1 = predict_cls.shape
    mat = mat.astype(jnp.int32) * valid[:, None].astype(jnp.int32)
    pred = _clamp01(predict_cls)

    # background cluster id: the unique nonzero value in column 0
    # (reference heads.py:14-21); 0 when absent -> matches no cid below.
    bg_ind = jnp.max(mat[:, 0])

    # background-branch per-row BCE is cluster-independent: hoist it
    gt_tmp = (mat != 0).astype(pred.dtype)
    row_bce = jnp.mean(_bce(pred, jnp.clip(gt_tmp, 0, 1)), axis=1)  # (N,)

    cids = jnp.arange(1, max_clusters + 1, dtype=jnp.int32)  # (K,)
    tf = mat[None, :, :] == cids[:, None, None]  # (K, N, C+1)
    member = (jnp.any(tf, axis=2) & valid[None, :]).astype(pred.dtype)  # (K, N)
    count = jnp.sum(member, axis=1)  # (K,)
    present = count > 0

    # foreground branch: mean prediction over members vs. cluster classes
    col_ind = jnp.any(tf, axis=1).astype(pred.dtype)  # (K, C+1)
    # Precision.HIGHEST: these matmuls replace exact f32 elementwise
    # reductions of the reference; default TPU precision would round the
    # operands to bf16 and log(1-mean_vec) amplifies that for
    # near-saturated clusters. Negligible cost at K=64, C+1<=81.
    mean_vec = jnp.matmul(
        member, pred, precision=jax.lax.Precision.HIGHEST
    ) / jnp.maximum(count, 1.0)[:, None]  # (K, C+1)
    fg_loss = count * jnp.mean(
        _bce(mean_vec, jnp.clip(col_ind, 0, 1)), axis=1
    )

    # background branch (== count * mean BCE over member rows)
    bg_loss = jnp.matmul(
        member, row_bce, precision=jax.lax.Precision.HIGHEST
    )  # (K,)

    contrib = jnp.where(cids == bg_ind, bg_loss, fg_loss)
    total = jnp.sum(jnp.where(present, contrib, 0.0))
    fg_bg_num = 1e-6 + jnp.sum(jnp.where(present, count, 0.0))
    return 12.0 * total / fg_bg_num
