"""Hardening of the in-repo COCOeval (cim_tpu/evaluation/coco.py).

pycocotools is unavailable in this image, so every mAP number the
framework reports flows through our own COCOeval — which makes
self-validation critical. Two layers here:

1. Hand-built golden cases for the protocol corners the basic suite
   (tests/test_coco_eval.py) does not reach: crowd (`iscrowd`) matching,
   area-range ignores, maxDets caps, and score ties.
2. A randomized cross-check: an INDEPENDENT brute-force matcher +
   PR-curve evaluator written in this file (two-phase best-match
   formulation instead of the single-scan loop; plain mask arrays
   instead of the RLE codec), fuzzed over ~100 random bbox and segm
   scenes, asserting identical precision vectors / AP / recall.

Protocol reference: the published pycocotools COCOeval algorithm, which
the reference consumes via lib/datasets/json_inference.py:24-56 and
lib/datasets/json_dataset_evaluator.py:38-56.
"""
from __future__ import annotations

import numpy as np
import pytest

from cim_tpu.evaluation import rle as rle_util
from cim_tpu.evaluation.coco import COCO, COCOeval

# --------------------------------------------------------------------------- #
# Independent brute-force evaluator
# --------------------------------------------------------------------------- #


def _naive_iou_matrix(dts, gts, mode):
    """IoU from raw geometry (no shared code with evaluation/coco.py):
    bbox xywh or raw binary masks; crowd gt -> union = dt area."""
    out = np.zeros((len(dts), len(gts)), np.float64)
    for j, g in enumerate(gts):
        crowd = bool(g.get("iscrowd", 0))
        for i, d in enumerate(dts):
            if mode == "bbox":
                dx, dy, dw, dh = d["bbox"]
                gx, gy, gw, gh = g["bbox"]
                iw = min(dx + dw, gx + gw) - max(dx, gx)
                ih = min(dy + dh, gy + gh) - max(dy, gy)
                inter = max(iw, 0.0) * max(ih, 0.0)
                da, ga = dw * dh, gw * gh
            else:
                inter = float(np.logical_and(d["_mask"], g["_mask"]).sum())
                da = float(d["_mask"].sum())
                ga = float(g["_mask"].sum())
            union = da if crowd else da + ga - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def _naive_match_image(gts, dts, iou, thr, area_rng):
    """Two-phase greedy matching for one (image, category, threshold).

    Semantics being replicated (published COCOeval):
      - dt in score order; gt sorted non-ignored first;
      - a dt takes the max-IoU available gt with iou >= thr, preferring
        ANY non-ignored gt over ignored ones; ties between equal IoUs go
        to the later gt in sort order (the scan overwrites on >=);
      - matched non-crowd gts become unavailable, crowd gts stay available;
      - dt matched to an ignored gt is ignored; unmatched dt outside the
        area range is ignored.
    Returns (tp, ignore) flag lists aligned with dts, and num_gt.
    """
    gt_ignore = [
        1 if (g.get("iscrowd", 0) or g["area"] < area_rng[0] or g["area"] > area_rng[1])
        else 0
        for g in gts
    ]
    order = sorted(range(len(gts)), key=lambda i: gt_ignore[i])
    gt_taken = [False] * len(gts)
    tp, ign = [], []
    for di in range(len(dts)):
        best, best_iou, best_phase = -1, None, None
        for phase in (0, 1):  # non-ignored first, ignored only if no real hit
            if phase == 1 and best_phase == 0:
                break
            for gi in order:
                if gt_ignore[gi] != phase:
                    continue
                if gt_taken[gi] and not gts[gi].get("iscrowd", 0):
                    continue
                floor = best_iou if best_iou is not None else min(thr, 1 - 1e-10)
                if iou[di, gi] < floor:
                    continue
                best, best_iou, best_phase = gi, iou[di, gi], phase
        if best == -1:
            d = dts[di]
            outside = d["area"] < area_rng[0] or d["area"] > area_rng[1]
            tp.append(False)
            ign.append(outside)
        else:
            gt_taken[best] = True
            tp.append(gt_ignore[best] == 0)
            ign.append(gt_ignore[best] == 1)
    num_gt = sum(1 for f in gt_ignore if f == 0)
    return tp, ign, num_gt


def naive_precision(scenes, cat, thr, area_rng, max_det, mode,
                    rec_thrs=None):
    """Full-dataset 101-point interpolated precision vector for one
    (category, iouThr, areaRng, maxDets) cell, plus (recall, num_gt)."""
    if rec_thrs is None:
        rec_thrs = np.linspace(0.0, 1.0, 101)
    all_scores, all_tp, all_ign = [], [], []
    npig = 0
    any_ann = False
    for scene in scenes:
        gts = [g for g in scene["gts"] if g["category_id"] == cat]
        dts = [d for d in scene["dts"] if d["category_id"] == cat]
        if not gts and not dts:
            continue
        any_ann = True
        dts = sorted(dts, key=lambda d: -d["score"])[:max_det]
        iou = _naive_iou_matrix(dts, gts, mode)
        tp, ign, num_gt = _naive_match_image(gts, dts, iou, thr, area_rng)
        npig += num_gt
        all_scores += [d["score"] for d in dts]
        all_tp += tp
        all_ign += ign
    if not any_ann or npig == 0:
        return None, None, npig
    order = np.argsort(-np.asarray(all_scores), kind="mergesort")
    tp = np.asarray(all_tp)[order]
    ign = np.asarray(all_ign)[order]
    keep = ~ign
    tps = np.cumsum(tp & keep)
    fps = np.cumsum(~tp & keep)
    rc = tps / npig
    pr = tps / np.maximum(tps + fps, np.spacing(1))
    # precision envelope + 101-point interpolation
    for i in range(len(pr) - 1, 0, -1):
        pr[i - 1] = max(pr[i - 1], pr[i])
    q = np.zeros(len(rec_thrs))
    inds = np.searchsorted(rc, rec_thrs, side="left")
    for ri, pi in enumerate(inds):
        if pi < len(pr):
            q[ri] = pr[pi]
    recall = rc[-1] if len(rc) else 0.0
    return q, recall, npig


# --------------------------------------------------------------------------- #
# Scene generation
# --------------------------------------------------------------------------- #

H, W = 60, 80


def _rand_box(rng, small=False):
    if small:
        w, h = rng.randint(2, 6, 2)
    else:
        w, h = rng.randint(4, 50, 2)
    x = rng.randint(0, W - w)
    y = rng.randint(0, H - h)
    return [float(x), float(y), float(w), float(h)]


def _box_mask(box):
    m = np.zeros((H, W), np.uint8)
    x, y, w, h = [int(v) for v in box]
    m[y : y + h, x : x + w] = 1
    return m


def _make_scene(rng, image_id, cats, mode, crowd_p=0.25):
    gts, dts = [], []
    for cat in cats:
        for _ in range(rng.randint(0, 4)):
            box = _rand_box(rng, small=rng.rand() < 0.3)
            g = {
                "image_id": image_id, "category_id": cat, "bbox": box,
                "iscrowd": int(rng.rand() < crowd_p),
                "area": box[2] * box[3],
            }
            if mode == "segm":
                g["_mask"] = _box_mask(box)
                g["area"] = float(g["_mask"].sum())
            gts.append(g)
        for _ in range(rng.randint(0, 6)):
            if gts and rng.rand() < 0.6:
                src = gts[rng.randint(len(gts))]["bbox"]
                jitter = rng.randint(-4, 5, 4)
                box = [
                    float(np.clip(src[0] + jitter[0], 0, W - 2)),
                    float(np.clip(src[1] + jitter[1], 0, H - 2)),
                    float(max(2, src[2] + jitter[2])),
                    float(max(2, src[3] + jitter[3])),
                ]
                box[2] = float(min(box[2], W - box[0]))
                box[3] = float(min(box[3], H - box[1]))
            else:
                box = _rand_box(rng)
            d = {
                "image_id": image_id, "category_id": cat, "bbox": box,
                "score": float(rng.rand()),
                "area": box[2] * box[3],
            }
            if mode == "segm":
                d["_mask"] = _box_mask(box)
                d["area"] = float(d["_mask"].sum())
            dts.append(d)
    return {"image_id": image_id, "gts": gts, "dts": dts}


def _build_eval(scenes, cats, mode, iou_thrs, max_dets, area_rng=None,
                area_lbl=None):
    images = [
        {"id": s["image_id"], "height": H, "width": W} for s in scenes
    ]
    gt_anns, results = [], []
    aid = 1
    for s in scenes:
        for g in s["gts"]:
            ann = {
                "id": aid, "image_id": g["image_id"],
                "category_id": g["category_id"], "bbox": list(g["bbox"]),
                "iscrowd": g["iscrowd"], "area": g["area"],
            }
            if mode == "segm":
                ann["segmentation"] = rle_util.encode(g["_mask"])
            gt_anns.append(ann)
            aid += 1
        for d in s["dts"]:
            r = {
                "image_id": d["image_id"], "category_id": d["category_id"],
                "score": d["score"],
            }
            if mode == "segm":
                r["segmentation"] = rle_util.encode(d["_mask"])
            else:
                r["bbox"] = list(d["bbox"])
            results.append(r)
    gt = COCO({
        "images": images,
        "annotations": gt_anns,
        "categories": [{"id": c, "name": f"c{c}"} for c in cats],
    })
    ev = COCOeval(gt, gt.loadRes(results), iouType=mode)
    ev.params.iouThrs = np.asarray(iou_thrs)
    ev.params.maxDets = list(max_dets)
    if area_rng is not None:
        ev.params.areaRng = area_rng
        ev.params.areaRngLbl = area_lbl
    ev.evaluate()
    ev.accumulate()
    return ev


# --------------------------------------------------------------------------- #
# Randomized cross-check
# --------------------------------------------------------------------------- #

IOU_THRS = (0.25, 0.5, 0.75)


@pytest.mark.parametrize("mode", ["bbox", "segm"])
@pytest.mark.parametrize("seed", list(range(6)))
def test_fuzz_against_bruteforce(mode, seed):
    """~100 random scenes total across seeds: identical precision vectors,
    AP, and recall for every (cat, iouThr, areaRng, maxDets) cell."""
    rng = np.random.RandomState(seed)
    cats = [1, 2, 3]
    scenes = [_make_scene(rng, i + 1, cats, mode) for i in range(8)]
    max_dets = [1, 3, 100]
    area_rng = [[0, 1e10], [0, 32**2], [32**2, 1e10]]
    area_lbl = ["all", "small", "notsmall"]
    ev = _build_eval(scenes, cats, mode, IOU_THRS, max_dets,
                     area_rng, area_lbl)
    prec = ev.eval["precision"]
    rec = ev.eval["recall"]
    cells = 0
    for t, thr in enumerate(IOU_THRS):
        for k, cat in enumerate(cats):
            for a, ar in enumerate(area_rng):
                for m, md in enumerate(max_dets):
                    q, r, npig = naive_precision(
                        scenes, cat, thr, ar, md, mode
                    )
                    got_p = prec[t, :, k, a, m]
                    got_r = rec[t, k, a, m]
                    if q is None:
                        assert (got_p == -1).all(), (cat, thr, ar, md)
                        assert got_r == -1
                        continue
                    np.testing.assert_allclose(
                        got_p, q, atol=1e-12,
                        err_msg=f"cat={cat} thr={thr} area={ar} maxDet={md}",
                    )
                    np.testing.assert_allclose(got_r, r, atol=1e-12)
                    cells += 1
    assert cells > 10  # the fuzz actually exercised populated cells


# --------------------------------------------------------------------------- #
# Hand-built golden corner cases
# --------------------------------------------------------------------------- #


def _scene_from(gts, dts, image_id=1):
    return {"image_id": image_id, "gts": gts, "dts": dts}


def _gt(box, cat=1, crowd=0, image_id=1):
    return {"image_id": image_id, "category_id": cat, "bbox": box,
            "iscrowd": crowd, "area": box[2] * box[3]}


def _dt(box, score, cat=1, image_id=1):
    return {"image_id": image_id, "category_id": cat, "bbox": box,
            "score": score, "area": box[2] * box[3]}


def test_crowd_gt_absorbs_false_positives():
    """A dt overlapping only a crowd gt is ignored (neither tp nor fp),
    and the crowd gt never counts toward recall's denominator."""
    crowd = _gt([0, 0, 40, 40], crowd=1)
    real = _gt([50, 10, 10, 10])
    dts = [
        _dt([50, 10, 10, 10], 0.9),   # tp on the real gt
        # fully inside the crowd: crowd IoU = inter/dt_area = 1 -> ignored,
        # but vs the same NON-crowd gt IoU = 400/1600 = 0.25 -> fp
        _dt([2, 2, 20, 20], 0.8),
        _dt([50, 45, 8, 8], 0.7),     # matches nothing -> fp
    ]
    scenes = [_scene_from([crowd, real], dts)]
    ev = _build_eval(scenes, [1], "bbox", (0.5,), [100])
    # npig == 1 (crowd excluded); tp@0.9 before any fp -> perfect AP
    ap = ev._summarize(1, iouThr=0.5, maxDets=100)
    assert ap == pytest.approx(1.0)
    assert ev._summarize(0, maxDets=100) == pytest.approx(1.0)  # recall
    # without the crowd flag: npig=2, the 40x40 gt goes unrecalled and the
    # 0.8 dt is a plain fp -> recall .5, AP = 51/101
    crowd2 = _gt([0, 0, 40, 40], crowd=0)
    ev2 = _build_eval([_scene_from([crowd2, real], dts)], [1], "bbox",
                      (0.5,), [100])
    assert ev2._summarize(0, maxDets=100) == pytest.approx(0.5)
    assert ev2._summarize(1, iouThr=0.5, maxDets=100) == pytest.approx(51 / 101)


def test_crowd_gt_matches_multiple_detections():
    """Crowd gts stay available: several dts can all land on one crowd
    region and all be ignored."""
    crowd = _gt([0, 0, 40, 40], crowd=1)
    real = _gt([50, 10, 10, 10])
    dts = [
        _dt([1, 1, 38, 38], 0.95),
        _dt([2, 2, 30, 30], 0.85),
        _dt([50, 10, 10, 10], 0.75),
    ]
    ev = _build_eval([_scene_from([crowd, real], dts)], [1], "bbox",
                     (0.5,), [100])
    assert ev._summarize(1, iouThr=0.5, maxDets=100) == pytest.approx(1.0)


def test_area_range_ignores_gt_and_unmatched_dt():
    """gt outside the area range is ignored (not in recall denominator);
    an unmatched dt outside the range is ignored rather than fp."""
    small_gt = _gt([10, 10, 4, 4])       # area 16
    large_gt = _gt([30, 20, 20, 20])     # area 400
    dts = [
        _dt([30, 20, 20, 20], 0.9),      # tp for the large gt
        _dt([60, 40, 4, 4], 0.8),        # small unmatched dt
    ]
    scenes = [_scene_from([small_gt, large_gt], dts)]
    area_rng = [[100, 1e10]]
    ev = _build_eval(scenes, [1], "bbox", (0.5,), [100],
                     area_rng, ["large_only"])
    # small gt ignored -> npig 1; small dt unmatched+outside -> ignored
    assert ev._summarize(1, iouThr=0.5, areaRng="large_only",
                         maxDets=100) == pytest.approx(1.0)


def test_dt_matched_to_area_ignored_gt_is_ignored():
    """A dt matching an area-ignored gt inherits the ignore (it is not a
    false positive against the in-range gts)."""
    small_gt = _gt([10, 10, 4, 4])
    large_gt = _gt([30, 20, 20, 20])
    dts = [
        _dt([10, 10, 4, 4], 0.95),       # matches the ignored small gt
        _dt([30, 20, 20, 20], 0.9),      # tp
    ]
    ev = _build_eval([_scene_from([small_gt, large_gt], dts)], [1],
                     "bbox", (0.5,), [100], [[100, 1e10]], ["large_only"])
    assert ev._summarize(1, iouThr=0.5, areaRng="large_only",
                         maxDets=100) == pytest.approx(1.0)


def test_max_dets_caps_detections_per_image():
    """maxDets=1 keeps only the top-scoring dt per image: the second gt
    goes unrecalled there, while maxDets=100 recalls both."""
    gts = [_gt([0, 0, 10, 10]), _gt([30, 30, 10, 10])]
    dts = [
        _dt([0, 0, 10, 10], 0.9),
        _dt([30, 30, 10, 10], 0.8),
    ]
    ev = _build_eval([_scene_from(gts, dts)], [1], "bbox", (0.5,), [1, 100])
    assert ev._summarize(0, maxDets=1) == pytest.approx(0.5)
    assert ev._summarize(0, maxDets=100) == pytest.approx(1.0)
    # 101-point AP of a perfect half-recall curve = 51/101
    assert ev._summarize(1, iouThr=0.5, maxDets=1) == pytest.approx(51 / 101)
    assert ev._summarize(1, iouThr=0.5, maxDets=100) == pytest.approx(1.0)


def test_score_ties_resolve_stably():
    """Equal scores: stable (mergesort) order in accumulation — identical
    between our evaluator and the brute-force one."""
    gts = [_gt([0, 0, 10, 10]), _gt([30, 30, 10, 10])]
    dts = [
        _dt([0, 0, 10, 10], 0.5),
        _dt([60, 30, 10, 10], 0.5),   # fp at the same score
        _dt([30, 30, 10, 10], 0.5),
    ]
    scenes = [_scene_from(gts, dts)]
    ev = _build_eval(scenes, [1], "bbox", (0.5,), [100])
    q, r, npig = naive_precision(
        scenes, 1, 0.5, [0, 1e10], 100, "bbox"
    )
    np.testing.assert_allclose(ev.eval["precision"][0, :, 0, 0, 0], q,
                               atol=1e-12)
    assert npig == 2


def test_equal_iou_ties_go_to_later_gt():
    """Two gts with identical IoU to one dt: the scan-order semantics give
    the match to the later gt; the earlier stays available for the next
    dt, so both dts end up tp."""
    # two identical gt boxes stacked at the same place
    gts = [_gt([0, 0, 10, 10]), _gt([0, 0, 10, 10])]
    dts = [_dt([0, 0, 10, 10], 0.9), _dt([0, 0, 10, 10], 0.8)]
    scenes = [_scene_from(gts, dts)]
    ev = _build_eval(scenes, [1], "bbox", (0.5,), [100])
    assert ev._summarize(0, maxDets=100) == pytest.approx(1.0)
    q, r, npig = naive_precision(scenes, 1, 0.5, [0, 1e10], 100, "bbox")
    np.testing.assert_allclose(ev.eval["precision"][0, :, 0, 0, 0], q,
                               atol=1e-12)
