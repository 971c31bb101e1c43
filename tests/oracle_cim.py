"""Numpy oracle for CIM mining + losses (test-only, intentionally loopy).

Transliterates the behavior of reference lib/modeling/heads.py
(instance_nms :237-258, CIM_label :319-407, forward assignment :476-502,
losses :10-166) for golden-value comparison against the fixed-shape JAX
implementation.
"""
import numpy as np


def instance_nms(scores, iou, thr):
    order = np.argsort(-scores, kind="stable")
    alive = list(order)
    kept = []
    while alive:
        i = alive.pop(0)
        kept.append(i)
        alive = [j for j in alive if iou[i, j] < thr]
    return np.array(kept, dtype=np.int64)


def cim_label(predict_cls, predict_det, labels, iou_map, asy_iou_map, p_seed, nms_thr, con_thr):
    n, c = predict_cls.shape
    det = np.broadcast_to(predict_det, (n, c)) if predict_det.shape[-1] == 1 else predict_det
    preds = predict_cls * det
    keep_count = int(np.ceil(p_seed * n))
    gt_labels = np.zeros((n, c + 1), np.float32)
    gt_weights = -np.ones((n,), np.float32)
    asy_flag = (asy_iou_map > con_thr).sum(-1, keepdims=True) < 0.9 * n  # (N,1)

    for cls in np.nonzero(labels)[0]:
        cls_prob = predict_cls[:, cls]
        det_prob = det[:, cls]
        preds_tmp = preds[:, cls]
        keep_sort_idx = np.argsort(-cls_prob, kind="stable")[:keep_count]
        sub_iou = iou_map[keep_sort_idx][:, keep_sort_idx]
        keep_local = instance_nms(cls_prob[keep_sort_idx], sub_iou, nms_thr)
        keep_nms_idx = keep_sort_idx[keep_local]

        temp_asy = asy_iou_map[:, keep_nms_idx] > con_thr
        flag = temp_asy * asy_flag
        if flag.sum() == 0:
            continue
        flag = flag[:, flag.sum(0) > 0]
        res_det = flag * det_prob[:, None]
        res_idx = np.unique(np.argmax(res_det, axis=0))
        is_higher = preds_tmp[res_idx] > gt_weights[res_idx]
        if is_higher.sum() > 0:
            keep_idxs = res_idx[is_higher]
            gt_labels[keep_idxs, :] = 0
            gt_labels[keep_idxs, cls + 1] = 1
            gt_weights[keep_idxs] = preds_tmp[keep_idxs]

    gt_idxs = gt_labels.sum(-1) > 0
    return gt_labels, gt_weights, gt_idxs, asy_flag[:, 0]


def assign_forward(gt_labels, gt_weights, gt_idxs, asy_flag, iou_map, cls_thr, iou_thr):
    if gt_idxs.sum() == 0:
        return None, None, None
    overlaps = iou_map[:, gt_idxs]
    glab = gt_labels[gt_idxs]
    gw = gt_weights[gt_idxs]
    max_v = overlaps.max(-1)
    arg = overlaps.argmax(-1)
    pseudo_labels = glab[arg].copy()
    loss_weights = gw[arg].copy()
    pseudo_iou = max_v.copy()

    ignore = max_v == 0
    pseudo_labels[ignore, :] = 0
    loss_weights[ignore] = 0

    bg = (max_v < cls_thr) & ~ignore
    pseudo_labels[bg, :] = 0
    pseudo_labels[bg, 0] = 1

    big = ~asy_flag
    pseudo_labels[big, :] = 0
    pseudo_labels[big, 0] = 1

    pseudo_iou = (pseudo_iou > iou_thr).astype(np.float32)
    return pseudo_labels, pseudo_iou, loss_weights


def mil_bag_loss(predict_cls, predict_det, labels):
    pred = (predict_cls * predict_det).sum(0, keepdims=True)
    pred = np.clip(pred, 1e-6, 1 - 1e-6)
    lab = np.concatenate([np.ones((1, 1)), labels[None, :]], 1)
    loss = -(lab * np.log(pred) + (1 - lab) * np.log(1 - pred))
    return loss.mean()


def loss_weight_bag_loss(predict, pseudo_labels, label_tmp, loss_weight):
    ind = (pseudo_labels != 0).sum(-1) != 0
    tmp = (pseudo_labels != 0).astype(np.float32)
    fg_scores = ind[:, None] * predict * tmp
    fg_val = fg_scores.max(0)
    fg_idx = fg_scores.argmax(0)
    un_val = predict.max(0)
    un_idx = predict.argmax(0)
    agg = fg_val * label_tmp + un_val * (1 - label_tmp)
    agg = np.clip(agg, 1e-6, 1 - 1e-6)
    flag = label_tmp == 1
    agg_idx = np.where(flag, fg_idx, un_idx)
    w = loss_weight[agg_idx].copy()
    w[~flag] = 1
    loss = -(label_tmp * np.log(agg) + (1 - label_tmp) * np.log(1 - agg)) * w
    return loss.mean()


def smooth_l1(x, y):
    d = np.abs(x - y)
    return np.where(d < 1, 0.5 * d * d, d - 0.5)


def cls_iou_loss(cls_score, iou_score, pseudo_labels, pseudo_iou_labels, loss_weights, labels):
    cls_score = np.clip(cls_score, 1e-6, 1 - 1e-6)
    iou_score = np.clip(iou_score, 1e-6, 1 - 1e-6)
    label_tmp = np.concatenate([[1.0], labels])
    ind = (pseudo_labels != 0).sum(-1) != 0

    if iou_score.shape[-1] == 1:
        op = np.concatenate([cls_score[:, :1], cls_score[:, 1:] * iou_score], 1)
        bag = loss_weight_bag_loss(op, pseudo_labels, label_tmp, loss_weights)
    else:
        bag = loss_weight_bag_loss(cls_score * iou_score, pseudo_labels, label_tmp, loss_weights)

    cls_l = 0.0
    iou_l = 0.0
    if ind.sum() != 0:
        pl = (pseudo_labels[ind] != 0).astype(np.float32)
        pil = pseudo_iou_labels[ind]
        cs = cls_score[ind]
        isc = iou_score[ind]
        lw = loss_weights[ind]
        cls_l = (-pl * np.log(cs) * lw[:, None]).sum() / pl.sum()
        fg = (pl[:, 1:] != 0).sum(-1) != 0
        if fg.sum() != 0:
            fpl = pl[fg]
            fpil = pil[fg]
            fisc = isc[fg]
            flw = lw[fg]
            if fisc.shape[-1] == fpl.shape[-1]:
                fisc = (fpl * fisc).sum(-1)
            else:
                fisc = fisc[:, 0]
            iou_l = (smooth_l1(fisc, fpil) * flw).sum() / fpl.sum()
    return cls_l, iou_l, bag


def pcl_loss(predict_cls, mat, labels):
    pred = np.clip(predict_cls, 1e-6, 1 - 1e-6)
    bg_cands = np.setdiff1d(mat[:, 0], [0])
    if len(bg_cands) == 0:
        bg_ind = 10000
    else:
        assert len(bg_cands) == 1
        bg_ind = bg_cands[0]
    loss = 0.0
    fg_bg = 1e-6

    def mil(p, t):
        p = np.clip(p, 1e-6, 1 - 1e-6)
        t = np.clip(t, 0, 1)
        return (-t * np.log(p) - (1 - t) * np.log(1 - p)).mean()

    for cid in np.unique(mat):
        if cid != 0 and cid != bg_ind:
            tf = mat == cid
            rows = tf.sum(1) != 0
            col = (tf.sum(0) != 0).astype(np.float32)
            sub = pred[rows]
            fg_bg += sub.shape[0]
            loss += sub.shape[0] * mil(sub.mean(0), col)
        elif cid == bg_ind:
            tf = mat == cid
            rows = tf.sum(1) != 0
            sub = pred[rows]
            gt = (mat[rows] != 0).astype(np.float32)
            fg_bg += sub.shape[0]
            loss += sub.shape[0] * mil(sub, gt)
    return 12 * loss / fg_bg
