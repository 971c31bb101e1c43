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
