"""Non-maximum suppression.

Three implementations, matching the three call sites of the reference:

- :func:`greedy_nms_from_iou` — exact greedy NMS over a *precomputed* IoU
  matrix, fixed-shape and jit-able. This is the device-side replacement for
  the per-class python-loop ``instance_nms`` used by CIM mining at train time
  (reference lib/modeling/heads.py:237-258): suppress j when
  ``iou(kept_i, j) >= thresh``.
- :func:`greedy_nms` — same algorithm over boxes (IoU computed on the fly),
  replacing torchvision ``nms`` fallback (heads.py:302) and the legacy CUDA
  bitmask NMS (lib/model/nms/src/nms_cuda_kernel.cu).
- :func:`nms_np` / :func:`soft_nms_np` — host-side numpy NMS with the
  detectron +1 area convention, bit-matching the reference's Cython kernels
  (lib/utils/cython_nms.c) used by eval post-processing
  (lib/core/test.py:387, lib/utils/mask_eval_utils.py). A C++ implementation
  (cim_tpu/native) is used when available; numpy otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cim_tpu.ops.boxes import box_iou

NEG_INF = -1e30


def greedy_nms_from_iou(iou, scores, thresh, valid=None):
    """Exact greedy NMS given an (N, N) IoU matrix.

    Semantics: iterate candidates in descending score order (stable ties —
    numpy order); a candidate is kept iff it is not suppressed by any
    previously-kept higher-ranked candidate with ``iou >= thresh``.

    Implementation: the greedy outcome is the unique fixpoint of
        kept(i)       = no higher-ranked overlapping j is kept or undecided
        suppressed(i) = some higher-ranked overlapping j is kept
    so instead of an N-step sequential loop, a while_loop resolves whole
    "generations" per round with vectorized matrix ops — the round count is
    the longest suppression chain (typically < 10), and each round is a
    masked (N, N) reduction that vmaps cleanly over classes.

    Args:
      iou: (N, N) pairwise IoU (any symmetric overlap measure).
      scores: (N,) scores.
      thresh: suppression threshold; overlap >= thresh suppresses.
      valid: optional (N,) bool; invalid entries are never kept and never
        suppress others (padding).

    Returns:
      keep: (N,) bool mask over the *original* index order.
    """
    n = scores.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    s = jnp.where(valid, scores, NEG_INF)
    # stable descending rank (ties resolved by original index, like the
    # reference's sorted()/argsort ordering)
    order = jnp.argsort(-s)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    # M[i, j] = True when j is a higher-ranked overlapping candidate of i
    m = (
        (rank[None, :] < rank[:, None])
        & (iou >= thresh)
        & valid[None, :]
        & valid[:, None]
    )

    def cond(state):
        kept, suppressed = state
        return jnp.any(valid & ~kept & ~suppressed)

    def body(state):
        kept, suppressed = state
        undecided_or_kept = ~suppressed
        blocked = jnp.any(m & undecided_or_kept[None, :], axis=1)
        new_kept = valid & ~suppressed & ~blocked
        kept = kept | new_kept
        new_sup = jnp.any(m & kept[None, :], axis=1)
        suppressed = suppressed | (new_sup & ~kept)
        return kept, suppressed

    init = (valid & ~valid, valid & ~valid)  # all-False, vma-following
    kept, _ = jax.lax.while_loop(cond, body, init)
    return kept


@functools.partial(jax.jit, static_argnames=("legacy_plus_one",))
def greedy_nms(boxes, scores, thresh, valid=None, legacy_plus_one=False):
    """Greedy NMS over (N,4) xyxy boxes; returns an (N,) bool keep mask."""
    iou = box_iou(boxes, boxes, legacy_plus_one=legacy_plus_one)
    return greedy_nms_from_iou(iou, scores, thresh, valid=valid)


def keep_mask_to_indices(keep_mask, scores):
    """Convert a keep mask to score-descending kept indices (host-side)."""
    keep_mask = np.asarray(keep_mask)
    scores = np.asarray(scores)
    idx = np.nonzero(keep_mask)[0]
    return idx[np.argsort(-scores[idx], kind="stable")]


def nms_np(dets: np.ndarray, thresh: float) -> list:
    """Host greedy NMS, reference cython_nms.nms semantics.

    dets: (N, 5) [x1, y1, x2, y2, score] float32. Areas use the detectron
    +1 convention; suppression at ``ovr >= thresh``; assumes no particular
    pre-sorting (sorts internally, like the cython kernel).
    Returns list of kept indices in descending score order.
    """
    if dets.shape[0] == 0:
        return []
    try:
        from cim_tpu.native import nms as native_nms

        return list(native_nms(dets.astype(np.float32), float(thresh)))
    except Exception:
        pass
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    suppressed = np.zeros(dets.shape[0], dtype=bool)
    for _i in range(len(order)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(int(i))
        rest = order[_i + 1 :]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[rest] - inter)
        suppressed[rest[ovr >= thresh]] = True
    return keep


def soft_nms_np(
    dets: np.ndarray,
    sigma: float = 0.5,
    overlap_thresh: float = 0.3,
    score_thresh: float = 0.001,
    method: str = "linear",
):
    """Host soft-NMS, reference cython_nms.soft_nms semantics
    (lib/utils/boxes.py:327-345; the cython kernel it wraps).

    Returns (dets_out, keep_indices).
    """
    methods = {"hard": 0, "linear": 1, "gaussian": 2}
    assert method in methods, f"Unknown soft_nms method: {method}"
    method_id = methods[method]

    boxes = dets.copy().astype(np.float32)
    n = boxes.shape[0]
    inds = np.arange(n)
    i = 0
    while i < n:
        # swap max-scoring remaining box into position i
        maxpos = i + np.argmax(boxes[i:n, 4])
        boxes[[i, maxpos]] = boxes[[maxpos, i]]
        inds[[i, maxpos]] = inds[[maxpos, i]]
        tx1, ty1, tx2, ty2, _ = boxes[i]
        tarea = (tx2 - tx1 + 1) * (ty2 - ty1 + 1)

        pos = i + 1
        while pos < n:
            x1, y1, x2, y2, s = boxes[pos]
            area = (x2 - x1 + 1) * (y2 - y1 + 1)
            iw = min(tx2, x2) - max(tx1, x1) + 1
            ih = min(ty2, y2) - max(ty1, y1) + 1
            if iw > 0 and ih > 0:
                ov = iw * ih / (tarea + area - iw * ih)
                if method_id == 1:  # linear
                    weight = 1.0 - ov if ov > overlap_thresh else 1.0
                elif method_id == 2:  # gaussian
                    weight = np.exp(-(ov * ov) / sigma)
                else:  # hard nms
                    weight = 0.0 if ov >= overlap_thresh else 1.0
                boxes[pos, 4] *= weight
                if boxes[pos, 4] < score_thresh:
                    boxes[pos] = boxes[n - 1]
                    inds[pos] = inds[n - 1]
                    n -= 1
                    pos -= 1
            pos += 1
        i += 1
    return boxes[:n], inds[:n]
