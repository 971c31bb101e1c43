"""Inference engine: single-pass detection + multi-scale/flip TTA.

Behavior contracts:
- lib/core/test.py im_detect_bbox (:83-146): resize image by
  scale = target/max_side (lib/utils/blob.py get_target_scale:162-169),
  scale rois, forward, average the K refine scores
  (cls*iou)[:, 1:] over branches (model_builder.py testing_function:60-68
  + test.py:130-133);
- im_detect_bbox_aug (:149-240): hflip + per-scale (+hflip) + identity,
  score heuristic AVG over the 10 passes, coordinates ID;
- hflip flips the image, boxes (W - x2 - 1) and the 7x7 masks
  (test.py:243-265).

TPU design: one jitted forward per (padded image bucket, padded proposal
count); images are zero-padded up to 128-multiples (exact for interior
features — conv zero-padding makes the extension a no-op away from the
pad border) and proposals to a fixed N bucket, so the 10 TTA passes hit at
most len(scales)+1 compiled programs that are reused across the dataset.
"""
from __future__ import annotations


import math

import jax
import jax.numpy as jnp
import numpy as np

from cim_tpu.data.transforms import (
    prep_image,
    prep_image_uint8_rgb,
    scale_for_target,
)
from cim_tpu.ops.boxes import flip_boxes

PAD_MULTIPLE = 128


def _round_up(x: int, m: int) -> int:
    return int(math.ceil(x / m) * m)


class Evaluator:
    """Wraps a model + variables with shape-bucketed jitted TTA inference."""

    def __init__(self, cfg, model, variables):
        from cim_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache()
        self.cfg = cfg
        self.model = model
        # device-resident variables passed as a jit ARGUMENT: closing over
        # the param tree embeds ~1GB of literal weights into the MLIR and
        # stalls/crashes the remote AOT compiler
        self.variables = jax.device_put(variables)
        self._apply = jax.jit(self._forward)

    def _forward(self, variables, image, rois, masks, valid, im_h, im_w):
        if image.dtype == jnp.uint8:
            # device-side "ToTensor" normalization: the host ships the
            # resized uint8 RGB image (4x less transfer, no single-core
            # float math per TTA pass). Padding must stay exactly zero in
            # normalized space (conv zero-padding equivalence), so mask by
            # the true image extent.
            from cim_tpu.data.transforms import TORCH_MEAN, TORCH_STD

            image = (
                image.astype(jnp.float32) / 255.0 - jnp.asarray(TORCH_MEAN)
            ) / jnp.asarray(TORCH_STD)
            hp, wp = image.shape[:2]
            rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
            inside = (rows < im_h) & (cols < im_w)
            image = jnp.where(inside[..., None], image, 0.0)
        # im_hw threads valid-extent masking through the backbone +
        # RoIAlign border logic: padded-bucket scores == unpadded scores
        out = self.model.apply(
            variables, image, rois, masks, valid, im_hw=(im_h, im_w)
        )
        # refine_score[k] = (cls_k * iou_k)[:, 1:]; mean over K branches
        scores = out["refine_cls"] * out["refine_iou"]  # (K, N, C+1)
        return jnp.mean(scores[:, :, 1:], axis=0)  # (N, C)

    # ------------------------------------------------------------------ #
    def _pad_to_bucket(self, im, boxes, masks):
        n = boxes.shape[0]
        n_pad = max(256, _round_up(n, 256))
        h, w = im.shape[:2]
        hp, wp = _round_up(h, PAD_MULTIPLE), _round_up(w, PAD_MULTIPLE)
        im_p = np.zeros((hp, wp, 3), im.dtype)
        im_p[:h, :w] = im
        boxes_p = np.zeros((n_pad, 4), np.float32)
        boxes_p[:n] = boxes
        masks_p = np.zeros((n_pad,) + masks.shape[1:], np.float32)
        masks_p[:n] = masks
        valid = np.zeros(n_pad, bool)
        valid[:n] = True
        return im_p, boxes_p, masks_p, valid

    def im_detect_bbox(self, im, boxes, masks, target_scale, target_max_size):
        """One forward pass at one scale. im: HxWx3 uint8 BGR (cv2 layout).
        Returns (scores (N, C), boxes)."""
        cfg = self.cfg
        im_scale = scale_for_target(im.shape[:2], target_scale, target_max_size)
        if cfg.transform_mode == "ToTensor":
            # resize on host (uint8, cheap), normalize on device
            im_prep = prep_image_uint8_rgb(im, im_scale)
        else:
            im_prep = prep_image(im, im_scale, cfg.transform_mode, cfg.PIXEL_MEANS)
        rois = boxes.astype(np.float32) * im_scale
        n = boxes.shape[0]
        im_p, rois_p, masks_p, valid = self._pad_to_bucket(im_prep, rois, masks)
        scores = self._apply(
            self.variables, jnp.asarray(im_p), jnp.asarray(rois_p),
            jnp.asarray(masks_p), jnp.asarray(valid),
            im_prep.shape[0], im_prep.shape[1],
        )
        return np.asarray(scores)[:n], boxes

    def im_detect_bbox_hflip(self, im, boxes, masks, target_scale, target_max_size):
        im_hf = im[:, ::-1, :]
        im_width = im.shape[1]
        boxes_hf = np.asarray(flip_boxes(jnp.asarray(boxes), im_width))
        masks_hf = np.flip(masks, 2).copy()
        scores, _ = self.im_detect_bbox(
            im_hf, boxes_hf, masks_hf, target_scale, target_max_size
        )
        return scores, boxes  # detections map back to original boxes (ID)

    def im_detect_bbox_aspect_ratio(self, im, boxes, masks, aspect_ratio,
                                    hflip=False):
        """Width-relative aspect-ratio TTA (reference
        im_detect_bbox_aspect_ratio, test.py:284-317)."""
        from cim_tpu.data.transforms import aspect_ratio_rel
        from cim_tpu.ops.boxes import aspect_ratio as box_ar

        im_ar = aspect_ratio_rel(im, aspect_ratio)
        boxes_ar = np.asarray(box_ar(jnp.asarray(boxes), aspect_ratio))
        cfg = self.cfg
        if hflip:
            scores, _ = self.im_detect_bbox_hflip(
                im_ar, boxes_ar, masks, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE
            )
        else:
            scores, _ = self.im_detect_bbox(
                im_ar, boxes_ar, masks, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE
            )
        return scores, boxes

    def im_detect_all(self, im, boxes, masks):
        """Full TTA per cfg.TEST.BBOX_AUG (reference im_detect_bbox_aug)."""
        cfg = self.cfg
        if not cfg.TEST.BBOX_AUG.ENABLED:
            return self.im_detect_bbox(
                im, boxes, masks, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE
            )

        scores_ts = []
        if cfg.TEST.BBOX_AUG.H_FLIP:
            s, _ = self.im_detect_bbox_hflip(
                im, boxes, masks, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE
            )
            scores_ts.append(s)
        for scale in cfg.TEST.BBOX_AUG.SCALES:
            max_size = cfg.TEST.BBOX_AUG.MAX_SIZE
            s, _ = self.im_detect_bbox(im, boxes, masks, scale, max_size)
            scores_ts.append(s)
            if cfg.TEST.BBOX_AUG.SCALE_H_FLIP:
                s, _ = self.im_detect_bbox_hflip(im, boxes, masks, scale, max_size)
                scores_ts.append(s)
        for ar in cfg.TEST.BBOX_AUG.ASPECT_RATIOS:
            s, _ = self.im_detect_bbox_aspect_ratio(im, boxes, masks, ar)
            scores_ts.append(s)
            if cfg.TEST.BBOX_AUG.ASPECT_RATIO_H_FLIP:
                s, _ = self.im_detect_bbox_aspect_ratio(
                    im, boxes, masks, ar, hflip=True
                )
                scores_ts.append(s)
        s_i, boxes_i = self.im_detect_bbox(
            im, boxes, masks, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE
        )
        scores_ts.append(s_i)

        heur = cfg.TEST.BBOX_AUG.SCORE_HEUR
        if heur == "ID":
            scores_c = s_i
        elif heur == "AVG":
            scores_c = np.mean(scores_ts, axis=0)
        elif heur == "UNION":
            scores_c = np.vstack(scores_ts)
        else:
            raise NotImplementedError(f"Score heur {heur} not supported")

        if cfg.TEST.BBOX_AUG.COORD_HEUR == "ID":
            boxes_c = boxes_i
        elif cfg.TEST.BBOX_AUG.COORD_HEUR == "UNION":
            boxes_c = np.vstack([boxes] * len(scores_ts))
        else:
            raise NotImplementedError
        return scores_c, boxes_c


def box_results_with_nms_and_limit(cfg, scores, boxes):
    """Score threshold + per-class NMS + top-K over all classes
    (reference lib/core/test.py:355-423). scores: (N, C) WITHOUT bg;
    boxes: (N, 4) class-agnostic. Returns (scores, boxes, cls_boxes) where
    cls_boxes[j] for j in 1..C holds (n_j, 5) dets of class j-1."""
    from cim_tpu.ops.nms import nms_np, soft_nms_np

    num_classes = cfg.MODEL.NUM_CLASSES
    cls_boxes = [np.zeros((0, 5), np.float32) for _ in range(num_classes)]
    for j in range(num_classes):
        inds = np.where(scores[:, j] > cfg.TEST.SCORE_THRESH)[0]
        scores_j = scores[inds, j]
        boxes_j = boxes[inds]
        dets_j = np.hstack([boxes_j, scores_j[:, None]]).astype(np.float32)
        if cfg.TEST.SOFT_NMS.ENABLED:
            nms_dets, _ = soft_nms_np(
                dets_j,
                sigma=cfg.TEST.SOFT_NMS.SIGMA,
                overlap_thresh=cfg.TEST.NMS,
                score_thresh=0.0001,
                method=cfg.TEST.SOFT_NMS.METHOD,
            )
        else:
            keep = nms_np(dets_j, cfg.TEST.NMS)
            nms_dets = dets_j[keep]
        # post-NMS box voting (reference test.py:390-396; off by default)
        if cfg.TEST.BBOX_VOTE.ENABLED and len(nms_dets):
            from cim_tpu.ops.boxes import box_voting_np

            nms_dets = box_voting_np(
                nms_dets, dets_j, cfg.TEST.BBOX_VOTE.VOTE_TH,
                scoring_method=cfg.TEST.BBOX_VOTE.SCORING_METHOD,
            )
        cls_boxes[j] = nms_dets

    if cfg.TEST.DETECTIONS_PER_IM > 0:
        image_scores = np.hstack([cls_boxes[j][:, -1] for j in range(num_classes)])
        if len(image_scores) > cfg.TEST.DETECTIONS_PER_IM:
            image_thresh = np.sort(image_scores)[-cfg.TEST.DETECTIONS_PER_IM]
            for j in range(num_classes):
                keep = np.where(cls_boxes[j][:, -1] >= image_thresh)[0]
                cls_boxes[j] = cls_boxes[j][keep]

    # 1-indexed class list with empty bg slot (reference test.py:410-415)
    out = [np.zeros((0, 5), np.float32)] + cls_boxes
    im_results = np.vstack([out[j] for j in range(1, num_classes)])
    return im_results[:, -1], im_results[:, :-1], out


def box_results_for_corloc(cfg, scores, boxes):
    """Argmax box per class (CorLoc protocol, reference test.py:320-352)."""
    num_classes = cfg.MODEL.NUM_CLASSES
    cls_boxes = []
    for j in range(num_classes):
        max_ind = int(np.argmax(scores[:, j]))
        cls_boxes.append(
            np.hstack([boxes[max_ind][None, :], [[scores[max_ind, j]]]]).astype(
                np.float32
            )
        )
    out = [np.zeros((0, 5), np.float32)] + cls_boxes
    im_results = np.vstack([out[j] for j in range(1, num_classes)])
    return im_results[:, -1], im_results[:, :-1], out
