"""Golden parity against the *executed* reference VOC evaluators.

/root/reference/lib/datasets/voc_eval.py and dis_eval.py import only
numpy/six/xml, so the real voc_eval (detection AP with difficult-flag
handling and the greedy per-image matching) and dis_eval (CorLoc) run
directly as oracles for cim_tpu.evaluation.voc_eval — fed through their
own on-disk protocol (per-class det files, per-image XML annotations,
imageset file, annotation cache), while the cim_tpu side consumes the
same data in memory. One compat shim: the reference calls
`.astype(np.bool)`, an alias modern numpy removed; it is re-aliased to
the builtin bool for the duration of the call (identical semantics).
"""
from __future__ import annotations

import importlib.util

import numpy as np
import pytest

from cim_tpu.evaluation.voc_eval import (
    dis_eval_boxes,
    voc_ap,
    voc_eval_boxes,
)

REF_DIR = "/root/reference/lib/datasets"


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_voc():
    return _load(REF_DIR + "/voc_eval.py", "_ref_voc_eval")


@pytest.fixture(scope="module")
def ref_dis():
    return _load(REF_DIR + "/dis_eval.py", "_ref_dis_eval")


class _np_bool_shim:
    def __enter__(self):
        self.had = hasattr(np, "bool")
        if not self.had:
            np.bool = bool
        return self

    def __exit__(self, *a):
        if not self.had and hasattr(np, "bool"):
            del np.bool


def _write_xml(path, objs):
    body = "".join(
        f"""  <object>
    <name>{o['name']}</name>
    <pose>Unspecified</pose>
    <truncated>0</truncated>
    <difficult>{o['difficult']}</difficult>
    <bndbox><xmin>{o['bbox'][0]}</xmin><ymin>{o['bbox'][1]}</ymin>"""
        f"""<xmax>{o['bbox'][2]}</xmax><ymax>{o['bbox'][3]}</ymax></bndbox>
  </object>
"""
        for o in objs
    )
    path.write_text(f"<annotation>\n{body}</annotation>\n")


def _scene(rng, n_images=6, classes=("cat", "dog")):
    """Random gt (with difficult flags) + detections around/near them."""
    annotations = {}
    dets = {c: [] for c in classes}
    imagenames = [f"2009_{i:06d}" for i in range(n_images)]
    # guarantee npos > 0 per class: the reference yields nan AP when a
    # class has no non-difficult gt (rec = tp/0); ours returns 0 by
    # design (see test_voc_eval_nan_divergence_on_empty_class)
    anchor = {
        c: {"name": c, "difficult": 0,
            "bbox": [20 + 30 * k, 20, 70 + 30 * k, 80]}
        for k, c in enumerate(classes)
    }
    for name in imagenames:
        objs = [dict(anchor[c]) for c in classes] if name == imagenames[0] else []
        for c in classes:
            for _ in range(rng.randint(0, 4)):
                x1, y1 = rng.randint(1, 300), rng.randint(1, 200)
                w, h = rng.randint(10, 120), rng.randint(10, 100)
                objs.append({
                    "name": c, "difficult": int(rng.rand() < 0.25),
                    "bbox": [x1, y1, x1 + w, y1 + h],
                })
        annotations[name] = objs
        for c in classes:  # dets below
            for _ in range(rng.randint(0, 5)):
                gt_c = [o for o in objs if o["name"] == c]
                if gt_c and rng.rand() < 0.7:
                    b = gt_c[rng.randint(len(gt_c))]["bbox"]
                    j = rng.randint(-15, 16, 4)
                    bb = [b[0] + j[0], b[1] + j[1],
                          max(b[2] + j[2], b[0] + j[0] + 4),
                          max(b[3] + j[3], b[1] + j[1] + 4)]
                else:
                    x1, y1 = rng.randint(1, 300), rng.randint(1, 200)
                    bb = [x1, y1, x1 + rng.randint(8, 100),
                          y1 + rng.randint(8, 100)]
                dets[c].append(
                    (name, float(rng.rand()), *[float(v) for v in bb])
                )
    return imagenames, annotations, dets


def _write_reference_inputs(tmp_path, imagenames, annotations, dets):
    ann_dir = tmp_path / "Annotations"
    ann_dir.mkdir(exist_ok=True)
    for name in imagenames:
        _write_xml(ann_dir / f"{name}.xml", annotations[name])
    (tmp_path / "imageset.txt").write_text("\n".join(imagenames) + "\n")
    for c, rows in dets.items():
        (tmp_path / f"det_{c}.txt").write_text(
            "".join(
                f"{n} {s:.6f} {x1:.1f} {y1:.1f} {x2:.1f} {y2:.1f}\n"
                for (n, s, x1, y1, x2, y2) in rows
            )
        )
    return (
        str(tmp_path / "det_{:s}.txt"),
        str(ann_dir / "{:s}.xml"),
        str(tmp_path / "imageset.txt"),
        str(tmp_path / "cache"),
    )


@pytest.mark.parametrize("use_07", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_voc_eval_parity(ref_voc, tmp_path, seed, use_07):
    rng = np.random.RandomState(seed)
    imagenames, annotations, dets = _scene(rng)
    detpath, annopath, setfile, cache = _write_reference_inputs(
        tmp_path, imagenames, annotations, dets
    )
    for c in ("cat", "dog"):
        if not dets[c]:
            continue
        with _np_bool_shim():
            w_rec, w_prec, w_ap = ref_voc.voc_eval(
                detpath.replace("{:s}", "{}").format(c), annopath.replace("{:s}", "{}"),
                setfile, c, cache, ovthresh=0.5, use_07_metric=use_07,
            )
        parsed = {n: annotations[n] for n in imagenames}
        g_rec, g_prec, g_ap = voc_eval_boxes(
            dets[c], parsed, imagenames, c, ovthresh=0.5,
            use_07_metric=use_07,
        )
        np.testing.assert_allclose(g_ap, w_ap, rtol=1e-10, err_msg=c)
        np.testing.assert_allclose(g_rec, w_rec, rtol=1e-10)
        np.testing.assert_allclose(g_prec, w_prec, rtol=1e-10)


def test_voc_eval_difficult_excluded(ref_voc, tmp_path):
    """A detection matching only a difficult gt is neither tp nor fp, and
    difficult gts are excluded from npos (recall denominator)."""
    imagenames = ["2009_000001"]
    annotations = {
        "2009_000001": [
            {"name": "cat", "difficult": 1, "bbox": [10, 10, 60, 60]},
            {"name": "cat", "difficult": 0, "bbox": [150, 20, 210, 90]},
        ]
    }
    dets = {"cat": [
        ("2009_000001", 0.9, 10.0, 10.0, 60.0, 60.0),   # difficult only
        ("2009_000001", 0.8, 150.0, 20.0, 210.0, 90.0),  # real tp
    ]}
    detpath, annopath, setfile, cache = _write_reference_inputs(
        tmp_path, imagenames, annotations, dets
    )
    with _np_bool_shim():
        w_rec, w_prec, w_ap = ref_voc.voc_eval(
            detpath.replace("{:s}", "{}").format("cat"),
            annopath.replace("{:s}", "{}"), setfile, "cat", cache,
        )
    g_rec, g_prec, g_ap = voc_eval_boxes(
        dets["cat"], annotations, imagenames, "cat"
    )
    np.testing.assert_allclose(g_ap, w_ap, rtol=1e-10)
    assert w_ap == pytest.approx(1.0)  # npos==1, single tp, ignored dt


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dis_eval_corloc_parity(ref_dis, tmp_path, seed):
    """CorLoc (dis_eval.py): fraction of positive images where the
    top-scoring detection hits a gt at IoU >= 0.5."""
    rng = np.random.RandomState(50 + seed)
    imagenames, annotations, dets = _scene(rng, n_images=8)
    detpath, annopath, setfile, cache = _write_reference_inputs(
        tmp_path, imagenames, annotations, dets
    )
    for c in ("cat", "dog"):
        if not dets[c]:
            continue
        with _np_bool_shim():
            want = ref_dis.dis_eval(
                detpath.replace("{:s}", "{}").format(c),
                annopath.replace("{:s}", "{}"), setfile, c, cache,
                ovthresh=0.5,
            )
        got = dis_eval_boxes(
            dets[c], annotations, imagenames, c, ovthresh=0.5
        )
        np.testing.assert_allclose(got, want, rtol=1e-10, err_msg=c)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("use_07", [False, True])
def test_voc_ap_function_parity(ref_voc, seed, use_07):
    rng = np.random.RandomState(60 + seed)
    n = 40
    rec = np.sort(rng.rand(n))
    prec = rng.rand(n)
    want = ref_voc.voc_ap(rec.copy(), prec.copy(), use_07)
    got = voc_ap(rec, prec, use_07)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_voc_eval_nan_divergence_on_empty_class(ref_voc, tmp_path):
    """Documented divergence: with zero non-difficult gts for a class the
    reference computes rec = tp/0 -> nan AP (which would poison a mAP
    average); cim_tpu returns 0.0 for that class by design."""
    imagenames = ["2009_000001"]
    annotations = {"2009_000001": [
        {"name": "cat", "difficult": 1, "bbox": [10, 10, 60, 60]},
    ]}
    dets = {"cat": [("2009_000001", 0.5, 100.0, 100.0, 150.0, 150.0)]}
    detpath, annopath, setfile, cache = _write_reference_inputs(
        tmp_path, imagenames, annotations, dets
    )
    with _np_bool_shim():
        _, _, w_ap = ref_voc.voc_eval(
            detpath.replace("{:s}", "{}").format("cat"),
            annopath.replace("{:s}", "{}"), setfile, "cat", cache,
        )
    assert np.isnan(w_ap)
    _, _, g_ap = voc_eval_boxes(dets["cat"], annotations, imagenames, "cat")
    assert g_ap == 0.0


@pytest.mark.parametrize("seed", [5, 6])
def test_result_writer_one_based_offset_parity(ref_voc, tmp_path, seed):
    """The reference writes its VOC result files 1-BASED
    (voc_dataset_evaluator.py:96-98: every coordinate +1) while voc_eval
    parses the xml gt raw (voc_eval.py:45) — matching runs in 1-based
    coordinates. This test executes voc_eval over det files written with
    the reference's +1 and compares against our production det assembly
    (task_evaluation._dets_by_class, which must apply the same lift) —
    with borderline-IoU detections so a missing +1 CHANGES the AP (the
    fixture asserts the 0-based AP actually differs)."""
    from cim_tpu.evaluation.task_evaluation import _dets_by_class

    rng = np.random.RandomState(100 + seed)
    imagenames, annotations, dets0 = _scene(rng)
    # deterministic 1px-sensitive match: a 20x20 gt at [10,10,29,29] and a
    # same-size det displaced up-left by exactly 4px — IoU 16^2/(800-256)
    # = 0.47 in 0-based coords (no match) but 17^2/(800-289) = 0.566 once
    # the det is lifted +1 toward the raw 1-based gt (match)
    annotations[imagenames[0]].append(
        {"name": "cat", "difficult": 0, "bbox": [10, 10, 29, 29]}
    )
    dets0["cat"].append((imagenames[0], 0.999, 6.0, 6.0, 25.0, 25.0))

    # reference side: det files with the writer's +1
    dets_plus1 = {
        c: [(n, s, x1 + 1, y1 + 1, x2 + 1, y2 + 1)
            for (n, s, x1, y1, x2, y2) in rows]
        for c, rows in dets0.items()
    }
    detpath, annopath, setfile, cache = _write_reference_inputs(
        tmp_path, imagenames, annotations, dets_plus1
    )

    # our side: production assembly from 0-based all_boxes
    classes = ("cat", "dog")
    num_classes = len(classes)
    name_to_i = {n: i for i, n in enumerate(imagenames)}
    all_boxes = [[[] for _ in imagenames] for _ in range(num_classes + 1)]
    for j, c in enumerate(classes):
        per_img = {}
        for (n, s, x1, y1, x2, y2) in dets0[c]:
            per_img.setdefault(n, []).append([x1, y1, x2, y2, s])
        for n, rows in per_img.items():
            all_boxes[j + 1][name_to_i[n]] = np.array(rows, np.float64)

    class _DS:
        pass

    ds = _DS()
    ds.num_classes = num_classes
    import cim_tpu.evaluation.task_evaluation as te

    saved = te.classes_for
    te.classes_for = lambda n: list(classes)  # 2-class fixture space
    try:
        ours = _dets_by_class(ds, all_boxes, imagenames)
    finally:
        te.classes_for = saved

    parsed = {n: annotations[n] for n in imagenames}
    any_borderline = False
    for c in classes:
        if not dets0[c]:
            continue
        with _np_bool_shim():
            _, _, w_ap = ref_voc.voc_eval(
                detpath.replace("{:s}", "{}").format(c),
                annopath.replace("{:s}", "{}"),
                setfile, c, cache, ovthresh=0.5, use_07_metric=False,
            )
        ours_sorted = sorted(ours[c])
        _, _, g_ap = voc_eval_boxes(ours[c], parsed, imagenames, c)
        np.testing.assert_allclose(g_ap, w_ap, rtol=1e-10, err_msg=c)
        # discriminating power: WITHOUT the lift the AP differs
        _, _, ap0 = voc_eval_boxes(dets0[c], parsed, imagenames, c)
        if abs(ap0 - w_ap) > 1e-6:
            any_borderline = True
    assert any_borderline, "fixture failed to produce a 1px-sensitive match"
