#!/usr/bin/env python
"""Instance-segmentation evaluation CLI — the headline metric
(reference tools/evaluation.py + lib/datasets/json_inference.py).

Pipeline: load detections.pkl (per-proposal class scores), re-load the
original full-resolution COB proposal masks, optional proposal size filter
(2e-5..0.85 of the image area, reference :108-115), per-class NMS keeping
proposal indices (lib/utils/mask_eval_utils.py), RLE-encode the selected
COB masks into a COCO-format segmentation result JSON (multiprocessing
shards, reference :198-224), then COCOeval('segm') with mAP at IoU
{0.25, 0.5, 0.7, 0.75} (lib/datasets/json_inference.py:24-56).

Example:
  python tools/evaluation.py --cfg configs/resnet50_voc.yaml \
      --result_path Outputs/resnet50_voc/test/detections.pkl \
      --dataset voc2012sbdval --cob_dir data/VOC2012/COB_SBD_val
"""
import argparse
import json
import logging
import multiprocessing as mp
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger("tools.evaluation")

SEG_IOU_THRS = (0.25, 0.5, 0.7, 0.75)


def parse_args():
    parser = argparse.ArgumentParser(description="Instance-seg evaluation")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("--set", dest="set_cfgs", nargs="+", default=None)
    parser.add_argument("--result_path", required=True,
                        help="detections.pkl from test_net.py")
    parser.add_argument("--dataset", default="voc2012sbdval")
    parser.add_argument("--cob_dir", default=None,
                        help="directory with full-res COB .mat proposals; "
                        "default: masks from the proposal pkl (low-res)")
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--nprocs", type=int, default=8)
    parser.add_argument("--save_name", default="segm_results.json")
    return parser.parse_args()


def load_cob_masks(cob_dir, entry, coco_scheme=False):
    """Full-resolution COB proposal masks for one image
    (reference tools/evaluation.py:89-106 .mat reload).

    VOC scheme: <YYYY>_<NNNNNN>.mat with cell array maskmat[:, 0]
    (reference :104-105). COCO scheme: image basename .jpg->.mat, trying the
    COCO_train2014_/COCO_val2014_ prefixes first (reference :90-99).
    """
    from scipy.io import loadmat

    if coco_scheme:
        base = os.path.basename(entry["image"]).rsplit(".", 1)[0] + ".mat"
        for cand in ("COCO_train2014_" + base, "COCO_val2014_" + base, base):
            path = os.path.join(cob_dir, cand)
            if os.path.exists(path):
                break
        proposals = loadmat(
            path, verify_compressed_data_integrity=False
        )["maskmat"].reshape(-1)
    else:
        s = str(int(entry["id"]))
        file_name = s[:4] + "_" + s[4:]
        path = os.path.join(cob_dir, file_name + ".mat")
        proposals = loadmat(path)["maskmat"][:, 0]
    return [np.asarray(p) for p in proposals]


def eval_shard(args_tuple):
    (opts, entries, detections, cob_dir, cat_ids) = args_tuple
    from cim_tpu.config import get_default_cfg
    from cim_tpu.evaluation.mask_results import (
        coco_encode,
        mask_results_with_nms_and_limit_get_index,
    )

    cfg = get_default_cfg()
    cfg.MODEL.NUM_CLASSES = opts["num_classes"]
    cfg.TEST.SCORE_THRESH = opts["score_thresh"]
    cfg.TEST.NMS = opts["nms"]
    cfg.TEST.PROPOSAL_FILTER = opts["proposal_filter"]
    # thread the configured per-image cap into the shard (the reference
    # workers inherit the merged global cfg via fork; rebuilding a default
    # cfg here silently dropped a user's TEST.DETECTIONS_PER_IM override)
    cfg.TEST.DETECTIONS_PER_IM = opts.get("detections_per_im", 100)

    results = []
    for entry in entries:
        rec = detections[entry["image"]]
        scores = np.asarray(rec["scores"])
        boxes = np.asarray(rec["boxes"])

        if cob_dir is not None:
            masks_full = load_cob_masks(
                cob_dir, entry, coco_scheme=opts["coco_scheme"]
            )
        else:
            masks_full = None  # fall back to 7x7 masks upscaled below

        if cfg.TEST.PROPOSAL_FILTER:
            # size filter (reference :107-116): zero the scores of
            # proposals whose BOX covers < 2e-5 or > 0.85 of the image
            # (proposal_size_limit, reference :198); box areas, not mask
            # areas, and independent of the mask source
            areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            im_area = entry["height"] * entry["width"]
            bad = (areas < 2e-5 * im_area) | (areas > 0.85 * im_area)
            scores = scores.copy()
            scores[bad] = 0.0

        s, b, cls_boxes, cls_inds = mask_results_with_nms_and_limit_get_index(
            cfg, scores, boxes, cfg.TEST.DETECTIONS_PER_IM
        )
        for j in range(1, cfg.MODEL.NUM_CLASSES + 1):
            dets = cls_boxes[j]
            inds = cls_inds[j]
            for d, idx in zip(dets, inds):
                if masks_full is not None:
                    mask = np.asarray(masks_full[int(idx)], np.uint8)
                else:
                    # upscale the 7x7 proposal mask into its box (approx)
                    mask = _paste_7x7(
                        entry["masks"][int(idx)], entry["boxes"][int(idx)],
                        entry["height"], entry["width"],
                    )
                rle = coco_encode(mask)
                results.append(
                    {
                        "image_id": int(entry["id"]),
                        "category_id": int(cat_ids[j - 1]),
                        "segmentation": rle,
                        "score": float(d[4]),
                    }
                )
    return results


def _paste_7x7(mask7, box, height, width):
    import cv2

    x1, y1, x2, y2 = [int(round(v)) for v in box]
    x2 = max(x2, x1 + 1)
    y2 = max(y2, y1 + 1)
    out = np.zeros((height, width), np.uint8)
    patch = cv2.resize(
        mask7.astype(np.uint8), (x2 - x1 + 1, y2 - y1 + 1),
        interpolation=cv2.INTER_NEAREST,
    )
    out[y1 : y2 + 1, x1 : x2 + 1] = patch[: out.shape[0] - y1, : out.shape[1] - x1]
    return out


def coco_inst_seg_eval(gt_coco, res_json, iou_thrs=SEG_IOU_THRS):
    """Instance-seg mAP at the CIM thresholds
    (reference lib/datasets/json_inference.py:24-56)."""
    from cim_tpu.evaluation.coco import COCOeval

    coco_dt = gt_coco.loadRes(res_json)
    ev = COCOeval(gt_coco, coco_dt, iouType="segm")
    ev.params.iouThrs = np.array(iou_thrs)
    ev.params.maxDets = [1, 10, 100]
    ev.evaluate()
    ev.accumulate()
    out = {}
    for t in iou_thrs:
        vals = []
        per_class = ev.per_class_ap(iouThr=t, maxDets=100)
        valid = [v for v in per_class.values() if v > -1]
        out[f"mAP{int(t * 100)}"] = float(np.mean(valid)) if valid else -1.0
        out[f"per_class_AP{int(t * 100)}"] = per_class
    return out


def main():
    from cim_tpu.config import assert_and_infer_cfg, cfg_from_file, get_default_cfg
    from cim_tpu.data.json_dataset import JsonDataset
    from cim_tpu.engine.stats import setup_logging

    setup_logging()
    args = parse_args()

    cfg = get_default_cfg()
    cfg_from_file(cfg, args.cfg_file)
    if args.set_cfgs:
        from cim_tpu.config import cfg_from_list

        cfg_from_list(cfg, args.set_cfgs)
    if args.dataset == "voc2012sbdval":
        cfg.TEST.DATASETS = ("voc_2012_sbdval",)
        cfg.MODEL.NUM_CLASSES = 20
    elif args.dataset == "coco2017val":
        cfg.TEST.DATASETS = ("coco_2017_val",)
        cfg.MODEL.NUM_CLASSES = 80
    assert_and_infer_cfg(cfg, make_immutable=False)

    with open(args.result_path, "rb") as f:
        detections = pickle.load(f)
    if isinstance(detections, dict) and "all_boxes" in detections:
        # reference-format pkl ({'all_boxes': {image -> {scores, boxes}}},
        # reference :191-193); ours stores the inner dict directly
        detections = detections["all_boxes"]

    dataset = JsonDataset(cfg, cfg.TEST.DATASETS[0])
    roidb = dataset.get_roidb(
        gt=True,
        proposal_file=cfg.TEST.PROPOSAL_FILES[0]
        if cfg.TEST.PROPOSAL_FILES
        else None,
    )
    roidb = [e for e in roidb if e["image"] in detections]
    cat_ids = [
        dataset.contiguous_category_id_to_json_id[i]
        for i in range(cfg.MODEL.NUM_CLASSES)
    ]

    shards = [roidb[i :: args.nprocs] for i in range(args.nprocs)]
    opts = {
        "num_classes": cfg.MODEL.NUM_CLASSES,
        "score_thresh": cfg.TEST.SCORE_THRESH,
        "nms": cfg.TEST.NMS,
        "proposal_filter": cfg.TEST.PROPOSAL_FILTER,
        "detections_per_im": cfg.TEST.DETECTIONS_PER_IM,
        "coco_scheme": "coco" in cfg.TEST.DATASETS[0],
    }
    work = [
        (opts, shard, detections, args.cob_dir, cat_ids)
        for shard in shards
        if shard
    ]
    if args.nprocs > 1 and len(work) > 1:
        with mp.Pool(len(work)) as pool:
            all_results = pool.map(eval_shard, work)
    else:
        all_results = [eval_shard(w) for w in work]
    results = [r for shard in all_results for r in shard]

    output_dir = args.output_dir or os.path.dirname(args.result_path)
    os.makedirs(output_dir, exist_ok=True)
    out_json = os.path.join(output_dir, args.save_name)
    with open(out_json, "w") as f:
        json.dump(results, f)
    logger.info("Wrote %d segm results to %s", len(results), out_json)

    metrics = coco_inst_seg_eval(dataset.COCO, results)
    for k, v in metrics.items():
        if not k.startswith("per_class"):
            logger.info("%s: %.4f", k, v)
    with open(os.path.join(output_dir, "inst_seg_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=float)
    return metrics


if __name__ == "__main__":
    main()
