import numpy as np
import pytest

from cim_tpu.evaluation import rle as rle_util
from cim_tpu.evaluation.coco import COCO, COCOeval


def test_rle_roundtrip(rng):
    for _ in range(5):
        m = (rng.rand(23, 17) > 0.5).astype(np.uint8)
        enc = rle_util.encode(m)
        dec = rle_util.decode(enc)
        np.testing.assert_array_equal(dec, m)
        assert rle_util.area(enc) == m.sum()


def test_rle_counts_string_roundtrip(rng):
    counts = [0, 5, 3, 100, 2, 40000, 7]
    s = rle_util.counts_to_string(counts)
    assert rle_util.string_to_counts(s) == counts


def test_rle_bbox():
    m = np.zeros((10, 12), np.uint8)
    m[2:5, 3:8] = 1
    enc = rle_util.encode(m)
    np.testing.assert_array_equal(rle_util.to_bbox(enc), [3, 2, 5, 3])


def _toy_dataset():
    """2 images, 2 categories, boxes in xywh."""
    images = [
        {"id": 1, "width": 100, "height": 100, "file_name": "a.jpg"},
        {"id": 2, "width": 100, "height": 100, "file_name": "b.jpg"},
    ]
    categories = [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}]
    anns = [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
         "area": 400, "iscrowd": 0},
        {"id": 2, "image_id": 1, "category_id": 2, "bbox": [50, 50, 30, 30],
         "area": 900, "iscrowd": 0},
        {"id": 3, "image_id": 2, "category_id": 1, "bbox": [0, 0, 40, 40],
         "area": 1600, "iscrowd": 0},
    ]
    return COCO({"images": images, "categories": categories, "annotations": anns})


def test_cocoeval_perfect_detections():
    gt = _toy_dataset()
    res = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [50, 50, 30, 30], "score": 0.8},
        {"image_id": 2, "category_id": 1, "bbox": [0, 0, 40, 40], "score": 0.95},
    ]
    ev = COCOeval(gt, gt.loadRes(res), iouType="bbox")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    assert stats[0] == pytest.approx(1.0)
    assert stats[1] == pytest.approx(1.0)


def test_cocoeval_half_detections():
    gt = _toy_dataset()
    # only one of two cat gts found; dog perfect; plus one false positive
    res = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [50, 50, 30, 30], "score": 0.8},
        {"image_id": 2, "category_id": 2, "bbox": [70, 70, 10, 10], "score": 0.7},
    ]
    ev = COCOeval(gt, gt.loadRes(res), iouType="bbox")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    # cat: recall 1/2, precision 1 -> AP 0.5; dog: AP 1.0 (fp scored below tp)
    # dog eval on image 2: fp with no gt -> affects dog precision only
    assert 0.5 < stats[1] < 1.0


def test_cocoeval_localization_threshold():
    gt = _toy_dataset()
    # shifted box: IoU ~ 0.47 vs gt -> match at 0.25 but not at 0.5
    res = [
        {"image_id": 1, "category_id": 1, "bbox": [17, 10, 20, 20], "score": 0.9},
    ]
    ev = COCOeval(gt, gt.loadRes(res), iouType="bbox")
    ev.params.iouThrs = np.array([0.25, 0.5, 0.7, 0.75])
    ev.params.imgIds = [1]
    ev.params.catIds = [1]
    ev.evaluate()
    ev.accumulate()
    ap25 = ev.per_class_ap(iouThr=0.25)[1]
    ap50 = ev.per_class_ap(iouThr=0.5)[1]
    assert ap25 == pytest.approx(1.0)
    assert ap50 == pytest.approx(0.0)


def test_cocoeval_segm_with_rle():
    imgs = [{"id": 1, "width": 20, "height": 20, "file_name": "a.jpg"}]
    cats = [{"id": 1, "name": "cat"}]
    m = np.zeros((20, 20), np.uint8)
    m[5:15, 5:15] = 1
    gt_ann = [{
        "id": 1, "image_id": 1, "category_id": 1,
        "segmentation": rle_util.encode(m), "area": int(m.sum()),
        "bbox": [5, 5, 10, 10], "iscrowd": 0,
    }]
    gt = COCO({"images": imgs, "categories": cats, "annotations": gt_ann})
    res = [{
        "image_id": 1, "category_id": 1,
        "segmentation": rle_util.encode(m), "score": 0.9,
    }]
    ev = COCOeval(gt, gt.loadRes(res), iouType="segm")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    assert stats[0] == pytest.approx(1.0)
