#!/usr/bin/env python
"""Pseudo-label exporter for downstream Mask R-CNN refinement
(reference tools/generate_mask_for_MaskRCNN.py:79-305 +
lib/pycococreatortools semantics).

From train-set discovery.pkl scores: for each image and each *present*
gt class, apply score-threshold + NMS keeping proposal indices; export
either all NMS survivors or only the best-scoring one (--is_best) as
COCO-format annotations whose segmentation is the original COB proposal
mask (RLE via cim_tpu.evaluation.rle).

Output: <output_dir>/msrcnn_pseudo_label[_best].json, consumable by
mmdetection-style Mask R-CNN training; filter by score afterwards with
tools/change_mask_thr.py.
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

logger = logging.getLogger("tools.generate_mask")


def parse_args():
    parser = argparse.ArgumentParser(description="Export pseudo labels")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("--set", dest="set_cfgs", nargs="+", default=None)
    parser.add_argument("--result_path", required=True, help="discovery.pkl")
    parser.add_argument("--dataset", default="voc2012trainaug")
    parser.add_argument("--cob_dir", default=None,
                        help="full-res COB .mat directory")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--is_best", action="store_true",
                        help="keep only the best-scoring instance per class")
    parser.add_argument("--nprocs", type=int, default=8)
    return parser.parse_args()


def create_image_info(image_id, file_name, image_size):
    """(reference lib/pycococreatortools create_image_info)."""
    return {
        "id": image_id,
        "file_name": file_name,
        "width": image_size[0],
        "height": image_size[1],
    }


def create_annotation_info(instance_id, image_id, category_id, mask, score,
                           image_size):
    """COCO annotation with RLE segmentation + score
    (reference pycococreatortools.create_annotation_info_v1)."""
    from cim_tpu.evaluation import rle as rle_util

    mask = np.asarray(mask, np.uint8)
    enc = rle_util.encode(mask)
    area = int(rle_util.area(enc))
    if area == 0:
        return None
    bbox = rle_util.to_bbox(enc).tolist()
    return {
        "id": instance_id,
        "image_id": image_id,
        "category_id": category_id,
        "iscrowd": 0,
        "area": area,
        "bbox": bbox,
        "segmentation": enc,
        "score": float(score),
        "width": image_size[0],
        "height": image_size[1],
    }


def export_shard(payload):
    (opts, entries, detections, cob_dir) = payload
    from cim_tpu.config import get_default_cfg
    from cim_tpu.data.voc_meta import coco_nummap_id
    from cim_tpu.evaluation.mask_results import (
        mask_results_with_nms_and_limit_get_index,
    )
    from tools.evaluation import load_cob_masks

    cfg = get_default_cfg()
    cfg.MODEL.NUM_CLASSES = opts["num_classes"]
    cfg.TEST.SCORE_THRESH = opts["score_thresh"]
    cfg.TEST.NMS = opts["nms"]
    is_voc = opts["num_classes"] == 20

    images, annotations = [], []
    instance_id = 1
    for entry in entries:
        rec = detections[entry["image"]]
        scores = np.asarray(rec["scores"])
        boxes = np.asarray(rec["boxes"])
        img_id = int(entry["id"])
        img_size = (entry["width"], entry["height"])

        if cob_dir is not None:
            masks_full = load_cob_masks(cob_dir, entry["id"])
        else:
            masks_full = None

        _, _, cls_boxes, cls_inds = mask_results_with_nms_and_limit_get_index(
            cfg, scores, boxes, 100
        )
        images.append(
            create_image_info(
                img_id, os.path.basename(entry["image"]), img_size
            )
        )
        gt = entry["gt_classes"].reshape(-1)
        for cls_idx in range(1, opts["num_classes"] + 1):
            if gt[cls_idx - 1] <= 0:
                continue
            dets = cls_boxes[cls_idx]
            inds = cls_inds[cls_idx]
            if len(dets) == 0:
                continue
            order = np.argsort(-dets[:, 4])
            best_score = dets[order[0], 4]
            for i in order:
                score = dets[i, 4]
                if opts["is_best"] and score != best_score:
                    continue
                category_id = (
                    int(cls_idx) if is_voc else coco_nummap_id[int(cls_idx) - 1]
                )
                cob_ind = int(inds[i])
                if masks_full is not None:
                    mask = masks_full[cob_ind]
                else:
                    from tools.evaluation import _paste_7x7

                    mask = _paste_7x7(
                        entry["masks"][cob_ind], entry["boxes"][cob_ind],
                        entry["height"], entry["width"],
                    )
                info = create_annotation_info(
                    instance_id, img_id, category_id, mask, score, img_size
                )
                if info is not None:
                    annotations.append(info)
                    instance_id += 1
    return images, annotations


def main():
    from cim_tpu.config import cfg_from_file, cfg_from_list, get_default_cfg
    from cim_tpu.data.json_dataset import JsonDataset
    from cim_tpu.data.voc_meta import classes_for
    from cim_tpu.engine.stats import setup_logging

    setup_logging()
    args = parse_args()

    cfg = get_default_cfg()
    cfg_from_file(cfg, args.cfg_file)
    if args.dataset == "voc2012trainaug":
        train_name = "voc_2012_trainaug"
        cfg.MODEL.NUM_CLASSES = 20
    elif args.dataset == "coco2017train":
        train_name = "coco_2017_train"
        cfg.MODEL.NUM_CLASSES = 80
    else:
        raise ValueError(args.dataset)
    # --set applies AFTER the dataset defaults: an explicit user override
    # (e.g. MODEL.NUM_CLASSES) must not be silently clobbered
    if args.set_cfgs:
        cfg_from_list(cfg, args.set_cfgs)

    with open(args.result_path, "rb") as f:
        detections = pickle.load(f)

    dataset = JsonDataset(cfg, train_name)
    roidb = dataset.get_roidb(
        gt=True,
        proposal_file=cfg.TRAIN.PROPOSAL_FILES[0]
        if cfg.TRAIN.PROPOSAL_FILES
        else None,
    )
    roidb = [e for e in roidb if e["image"] in detections and not e["flipped"]]

    opts = {
        "num_classes": cfg.MODEL.NUM_CLASSES,
        "score_thresh": cfg.TEST.SCORE_THRESH,
        "nms": cfg.TEST.NMS,
        "is_best": args.is_best,
    }
    shards = [roidb[i :: args.nprocs] for i in range(args.nprocs)]
    work = [(opts, s, detections, args.cob_dir) for s in shards if s]
    if len(work) > 1:
        with mp.Pool(len(work)) as pool:
            outs = pool.map(export_shard, work)
    else:
        outs = [export_shard(w) for w in work]

    classes = classes_for(cfg.MODEL.NUM_CLASSES)
    coco_output = {
        "images": [im for o in outs for im in o[0]],
        "annotations": [],
        "categories": [
            {"id": i + 1, "name": c, "supercategory": "object"}
            for i, c in enumerate(classes)
        ],
    }
    instance_id = 1
    for _, anns in outs:
        for a in anns:
            a["id"] = instance_id
            instance_id += 1
            coco_output["annotations"].append(a)

    os.makedirs(args.output_dir, exist_ok=True)
    name = "msrcnn_pseudo_label_best.json" if args.is_best else "msrcnn_pseudo_label.json"
    out_path = os.path.join(args.output_dir, name)
    with open(out_path, "w") as f:
        json.dump(coco_output, f)
    logger.info(
        "Wrote %d images / %d annotations to %s",
        len(coco_output["images"]), len(coco_output["annotations"]), out_path,
    )


if __name__ == "__main__":
    main()
