import numpy as np

from cim_tpu.evaluation.voc_eval import dis_eval_boxes, voc_ap, voc_eval_boxes


def _annotations():
    return {
        "img1": [
            {"name": "cat", "difficult": 0, "bbox": [10, 10, 30, 30]},
            {"name": "dog", "difficult": 0, "bbox": [50, 50, 80, 80]},
        ],
        "img2": [
            {"name": "cat", "difficult": 0, "bbox": [5, 5, 25, 25]},
            {"name": "cat", "difficult": 1, "bbox": [60, 60, 90, 90]},
        ],
    }


IMAGES = ["img1", "img2"]


def test_voc_eval_perfect():
    dets = [
        ("img1", 0.9, 10, 10, 30, 30),
        ("img2", 0.8, 5, 5, 25, 25),
    ]
    rec, prec, ap = voc_eval_boxes(dets, _annotations(), IMAGES, "cat")
    assert ap == 1.0
    assert rec[-1] == 1.0  # difficult gt excluded from npos


def test_voc_eval_one_miss_one_fp():
    dets = [
        ("img1", 0.9, 10, 10, 30, 30),  # tp
        ("img2", 0.8, 70, 5, 95, 25),   # fp (wrong location)
    ]
    rec, prec, ap = voc_eval_boxes(dets, _annotations(), IMAGES, "cat")
    assert rec[-1] == 0.5
    np.testing.assert_allclose(prec, [1.0, 0.5])
    assert 0.4 < ap <= 0.5


def test_voc_eval_duplicate_detection_is_fp():
    dets = [
        ("img1", 0.9, 10, 10, 30, 30),
        ("img1", 0.85, 11, 11, 31, 31),  # duplicate on same gt -> fp
        ("img2", 0.8, 5, 5, 25, 25),
    ]
    rec, prec, ap = voc_eval_boxes(dets, _annotations(), IMAGES, "cat")
    assert rec[-1] == 1.0
    np.testing.assert_allclose(prec, [1.0, 0.5, 2.0 / 3.0])


def test_voc_ap_07_metric():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 0.5])
    ap11 = voc_ap(rec, prec, use_07_metric=True)
    # 11-point: t<=0.5 -> p=1 (6 points), t>0.5 -> p=0.5 (5 points)
    np.testing.assert_allclose(ap11, (6 * 1.0 + 5 * 0.5) / 11)


def test_corloc():
    # top detection correct in img1, wrong in img2 -> CorLoc 0.5
    dets = [
        ("img1", 0.9, 10, 10, 30, 30),
        ("img1", 0.4, 70, 70, 90, 90),
        ("img2", 0.8, 60, 5, 95, 30),
    ]
    corloc = dis_eval_boxes(dets, _annotations(), IMAGES, "cat")
    assert corloc == 0.5
    # dog present only in img1; no dog detections -> 0
    assert dis_eval_boxes([], _annotations(), IMAGES, "dog") == 0.0


def test_check_expected_results_gate():
    from cim_tpu.evaluation.task_evaluation import check_expected_results

    results = {"AP": {"mean": 0.51}}
    ok = check_expected_results(
        results, [["voc_2012_sbdval", "AP", "mean", 0.511]],
        atol=0.005, rtol=0.0,
    )
    assert ok == []
    bad = check_expected_results(
        results, [["voc_2012_sbdval", "AP", "mean", 0.60]],
        atol=0.005, rtol=0.0,
    )
    assert len(bad) == 1 and bad[0].startswith("FAIL")
