from cim_tpu.ops.boxes import (
    bbox_overlaps,
    box_iou,
    boxes_area,
    clip_boxes,
    flip_boxes,
    xywh_to_xyxy,
    xyxy_to_xywh,
)
from cim_tpu.ops.nms import greedy_nms, greedy_nms_from_iou, nms_np, soft_nms_np
from cim_tpu.ops.mask_iou import mask_iou, mask_asymmetric_iou
from cim_tpu.ops.roi_align import roi_align, roi_pool

__all__ = [
    "bbox_overlaps",
    "box_iou",
    "boxes_area",
    "clip_boxes",
    "flip_boxes",
    "xywh_to_xyxy",
    "xyxy_to_xywh",
    "greedy_nms",
    "greedy_nms_from_iou",
    "nms_np",
    "soft_nms_np",
    "mask_iou",
    "mask_asymmetric_iou",
    "roi_align",
    "roi_pool",
]
