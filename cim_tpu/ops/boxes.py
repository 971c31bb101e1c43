"""Box geometry ops (pure JAX, fixed shapes).

Two IoU conventions coexist in the reference and both are preserved here:

- the "detectron" / legacy convention with +1 pixel areas
  ``(x2 - x1 + 1) * (y2 - y1 + 1)`` used by the host-side eval NMS and
  ``bbox_overlaps`` (reference: lib/utils/cython_bbox.c, lib/utils/cython_nms.c,
  lib/utils/boxes.py:52-55);
- the torchvision convention without +1 used inside the CIM layer for
  box IoU fallback (reference: lib/utils/boxes.py:346-388, torchvision box_iou).

All functions are shape-polymorphic over leading batch dims and jit-safe.
"""
from __future__ import annotations

import jax.numpy as jnp


def boxes_area(boxes, legacy_plus_one: bool = False):
    """Area of (..., 4) xyxy boxes."""
    off = 1.0 if legacy_plus_one else 0.0
    w = boxes[..., 2] - boxes[..., 0] + off
    h = boxes[..., 3] - boxes[..., 1] + off
    return w * h


def box_iou(boxes_a, boxes_b, legacy_plus_one: bool = False):
    """Pairwise IoU between (N,4) and (K,4) xyxy boxes -> (N,K).

    With ``legacy_plus_one=True`` this matches the reference's Cython
    ``bbox_overlaps`` (lib/utils/cython_bbox.c); without it, torchvision's
    ``box_iou`` (used at lib/modeling/heads.py:433).
    """
    off = 1.0 if legacy_plus_one else 0.0
    area_a = boxes_area(boxes_a, legacy_plus_one)  # (N,)
    area_b = boxes_area(boxes_b, legacy_plus_one)  # (K,)

    lt = jnp.maximum(boxes_a[..., :, None, :2], boxes_b[..., None, :, :2])
    rb = jnp.minimum(boxes_a[..., :, None, 2:], boxes_b[..., None, :, 2:])
    wh = jnp.clip(rb - lt + off, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def bbox_overlaps(boxes, query_boxes):
    """Reference cython_bbox.bbox_overlaps semantics: +1 areas, and the
    *query* box area in the denominator union (lib/utils/cython_bbox).

    Note: unlike IoU, the cython kernel computes
    inter / (box_area + query_area - inter) which IS symmetric IoU with +1
    convention, so this is box_iou(legacy_plus_one=True).
    """
    return box_iou(boxes, query_boxes, legacy_plus_one=True)


def xyxy_to_xywh(xyxy):
    """(x1,y1,x2,y2) -> (x1,y1,w,h) with the +1 pixel convention
    (reference lib/utils/boxes.py xyxy_to_xywh)."""
    x1, y1 = xyxy[..., 0], xyxy[..., 1]
    w = xyxy[..., 2] - x1 + 1
    h = xyxy[..., 3] - y1 + 1
    return jnp.stack([x1, y1, w, h], axis=-1)


def xywh_to_xyxy(xywh):
    """(x1,y1,w,h) -> (x1,y1,x2,y2) with the +1 pixel convention."""
    x1, y1 = xywh[..., 0], xywh[..., 1]
    x2 = x1 + jnp.maximum(0.0, xywh[..., 2] - 1)
    y2 = y1 + jnp.maximum(0.0, xywh[..., 3] - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def clip_boxes(boxes, height, width):
    """Clip xyxy boxes to [0, width-1] x [0, height-1]
    (reference lib/utils/boxes.py clip_boxes_to_image)."""
    x1 = jnp.clip(boxes[..., 0], 0, width - 1)
    y1 = jnp.clip(boxes[..., 1], 0, height - 1)
    x2 = jnp.clip(boxes[..., 2], 0, width - 1)
    y2 = jnp.clip(boxes[..., 3], 0, height - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def flip_boxes(boxes, im_width):
    """Horizontal flip of xyxy boxes (reference lib/utils/boxes.py flip_boxes):
    x1' = W - x2 - 1, x2' = W - x1 - 1."""
    x1 = im_width - boxes[..., 2] - 1
    x2 = im_width - boxes[..., 0] - 1
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def bbox_transform(boxes, deltas, weights=(1.0, 1.0, 1.0, 1.0),
                   clip_value=4.828313737):
    """Apply regression deltas to xyxy boxes (reference
    lib/utils/boxes.py bbox_transform; clip = log(1000/8) =
    cfg.BBOX_XFORM_CLIP). Unused by the shipped CIM configs (no bbox
    regression head) but part of the box-utility surface."""
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0] + 1.0
    heights = boxes[..., 3] - boxes[..., 1] + 1.0
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, clip_value)
    dh = jnp.minimum(deltas[..., 3] / wh, clip_value)

    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w - 1.0,
            pred_ctr_y + 0.5 * pred_h - 1.0,
        ],
        axis=-1,
    )


def box_voting_np(top_dets, all_dets, thresh, scoring_method="ID", beta=1.0):
    """Bounding-box voting (reference lib/utils/boxes.py box_voting,
    arXiv:1505.01749; host-side eval refinement, off by default
    cfg.TEST.BBOX_VOTE). top_dets/all_dets: (n, 5) numpy arrays."""
    import numpy as np

    top_boxes = top_dets[:, :4]
    all_boxes = all_dets[:, :4]
    all_scores = all_dets[:, 4]
    out = top_dets.copy()
    iou = np.asarray(
        box_iou(jnp.asarray(top_boxes), jnp.asarray(all_boxes), True)
    )
    for k in range(top_dets.shape[0]):
        inds = np.where(iou[k] >= thresh)[0]
        boxes_to_vote = all_boxes[inds]
        ws = all_scores[inds]
        out[k, :4] = np.average(boxes_to_vote, axis=0, weights=ws)
        if scoring_method == "ID":
            pass
        elif scoring_method == "TEMP_AVG":
            # temperature-smooth each (p, 1-p) binary distribution, then
            # average the positive component (reference box_voting,
            # lib/utils/boxes.py:288-299) — scores ARE probabilities here
            p2 = np.vstack((ws, 1.0 - ws))
            x = np.log(p2 / p2.max(axis=0))
            x_exp = np.exp(x / beta)
            out[k, 4] = (x_exp / x_exp.sum(axis=0))[0].mean()
        elif scoring_method == "AVG":
            out[k, 4] = ws.mean()
        elif scoring_method == "IOU_AVG":
            out[k, 4] = np.average(ws, weights=iou[k, inds])
        elif scoring_method == "GENERALIZED_AVG":
            out[k, 4] = np.mean(ws**beta) ** (1.0 / beta)
        elif scoring_method == "QUASI_SUM":
            out[k, 4] = ws.sum() / float(len(ws)) ** beta
        else:
            raise NotImplementedError(scoring_method)
    return out


def aspect_ratio(boxes, ratio):
    """Scale x coordinates by a width-relative aspect ratio
    (reference lib/utils/boxes.py aspect_ratio)."""
    out = jnp.stack(
        [
            boxes[..., 0] * ratio,
            boxes[..., 1],
            boxes[..., 2] * ratio,
            boxes[..., 3],
        ],
        axis=-1,
    )
    return out
