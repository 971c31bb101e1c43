"""Golden parity against the *executed* reference regression gate.

/root/reference/lib/datasets/task_evaluation.py check_expected_results
(:103-156) runs for real over a grid of (actual, expected) pairs
straddling the tol = atol + rtol*|expected| boundary; the PASS/FAIL
classification it logs is the oracle for
cim_tpu.evaluation.task_evaluation.check_expected_results.

Known deliberate deviation: the reference only LOGS failures (and
optionally emails) — the process still exits 0; our CLI turns the
returned failure list into a non-zero exit
(tests/test_full_cli_chain.py::test_testnet_cli_exits_nonzero_on_gate_mismatch),
a strictly stronger gate with identical classification.
"""
from __future__ import annotations

import importlib
import logging
import sys
import types

import numpy as np
import pytest

from cim_tpu.evaluation.task_evaluation import check_expected_results

REF_LIB = "/root/reference/lib"


@pytest.fixture(scope="module")
def ref_te():
    from cim_tpu.ops.boxes import box_iou
    from cim_tpu.ops.nms import nms_np, soft_nms_np

    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    stub("torch._six", string_classes=str, int_classes=int)
    stub("pycocotools")
    stub("pycocotools.mask")
    coco_mod = types.ModuleType("pycocotools.coco")
    coco_mod.COCO = object
    cocoeval_mod = types.ModuleType("pycocotools.cocoeval")
    cocoeval_mod.COCOeval = object
    stubs["pycocotools.coco"] = coco_mod
    stubs["pycocotools.cocoeval"] = cocoeval_mod
    stubs["pycocotools"].coco = coco_mod
    stubs["pycocotools"].cocoeval = cocoeval_mod
    stubs["pycocotools"].mask = stubs["pycocotools.mask"]
    stub(
        "utils.cython_nms",
        nms=lambda dets, thresh: np.asarray(nms_np(dets, thresh), np.int64),
        soft_nms=soft_nms_np,
    )
    stub(
        "utils.cython_bbox",
        bbox_overlaps=lambda b, q: np.asarray(
            box_iou(b.astype(np.float32), q.astype(np.float32),
                    legacy_plus_one=True)
        ),
    )

    had = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_LIB)
    try:
        mod = importlib.import_module("datasets.task_evaluation")
        cfg_mod = importlib.import_module("core.config")
    finally:
        sys.path.remove(REF_LIB)
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod, cfg_mod


def test_expected_results_gate_classification_parity(ref_te, caplog):
    mod, cfg_mod = ref_te
    rcfg = cfg_mod.cfg
    rcfg.immutable(False)
    rcfg.EXPECTED_RESULTS_EMAIL = ""

    # pairs straddling tol = 0.005 + 0.1*|expected| from both sides,
    # incl. exact-boundary err == tol (reference: err > tol fails)
    cases = [
        ("ds", "box", "AP50", 51.1, 51.1),        # exact
        ("ds", "box", "AP50", 51.1, 51.1 + 5.114),  # just < tol? tol=5.115
        ("ds", "box", "AP50", 51.1, 51.1 + 5.116),  # just > tol
        ("ds", "box", "AP50", 51.1, 51.1 - 5.115),  # err == tol -> pass
        ("ds", "box", "AP", 0.0, 0.004),          # atol-only regime, pass
        ("ds", "box", "AP", 0.0, 0.006),          # atol-only regime, fail
        ("ds", "box", "AP75", 26.1, 20.0),        # clear fail
    ]
    expected = [[d, t, m, e] for d, t, m, e, _ in cases]
    results = {"ds": {"box": {}}}
    # the reference asserts metric presence; feed actuals one at a time
    ref_flags = []
    for (d, t, m, e, actual) in cases:
        rcfg.EXPECTED_RESULTS = [[d, t, m, e]]
        results[d][t][m] = actual
        with caplog.at_level(logging.DEBUG, logger=mod.logger.name):
            caplog.clear()
            mod.check_expected_results(results)
        text = "\n".join(r.getMessage() for r in caplog.records)
        assert ("FAIL" in text) != ("PASS" in text), text
        ref_flags.append("FAIL" in text)

    ours_flags = []
    for (d, t, m, e, actual) in cases:
        failures = check_expected_results(
            {t: {m: actual}}, [[d, t, m, e]]
        )
        ours_flags.append(bool(failures))

    assert ours_flags == ref_flags, (
        f"gate classification diverged: ours={ours_flags} ref={ref_flags}"
    )
