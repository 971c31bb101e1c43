"""Golden parity against the *executed* reference mask-IoU formulas.

/root/reference/lib/utils/mask_utils.py (mask_iou, mask_asymmetric_iou —
the python double loops create_cob_iou.py / create_cob_asy_iou.py run on
cupy) executes for real on its numpy path (chainer's
cuda.get_array_module stubbed to return numpy, exactly what chainer does
without a GPU) as the oracle for cim_tpu.ops.mask_iou's einsums — the
matrices every mining decision reads.

Also pins the asy map ORIENTATION end to end: the reference assembles
per-column slices mask_asymmetric_iou(all, m_j) and concatenates on
axis=1 (create_cob_asy_iou.py:44-51), giving map[i, j] = |m_i ∩ m_j| /
|m_j| ("row i contains column j") in float16 — compared against our
one-shot mask_asymmetric_iou(masks, masks).
"""
from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest

REF_MU = "/root/reference/lib/utils/mask_utils.py"


@pytest.fixture(scope="module")
def ref_mu():
    chainer = types.ModuleType("chainer")
    backends = types.ModuleType("chainer.backends")
    cuda = types.ModuleType("chainer.backends.cuda")
    cuda.get_array_module = lambda *a: np
    backends.cuda = cuda
    chainer.backends = backends
    stubs = {
        "chainer": chainer,
        "chainer.backends": backends,
        "chainer.backends.cuda": cuda,
    }
    had = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location("_ref_mask_utils", REF_MU)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def _masks(rng, n, h, w):
    m = rng.rand(n, h, w) > 0.6
    m[0] = False  # empty mask: reference divides 0/0 -> nan; we emit 0
    return m


@pytest.mark.parametrize("seed", [0, 1])
def test_mask_iou_parity(ref_mu, seed):
    from cim_tpu.ops.mask_iou import mask_iou

    rng = np.random.RandomState(seed)
    a = _masks(rng, 12, 20, 24)
    b = rng.rand(9, 20, 24) > 0.55
    b[0] = False  # empty-vs-empty -> reference 0/0 nan, ours 0
    want = ref_mu.mask_iou(a, b)
    got = np.asarray(mask_iou(a, b))
    np.testing.assert_allclose(got, np.nan_to_num(want), rtol=1e-6)
    # the only deviation: empty ∪ empty — reference nan (0/0), we emit 0
    assert np.isnan(want[0, 0]) and got[0, 0] == 0.0
    assert not np.isnan(want[1:, 1:]).any()


@pytest.mark.parametrize("seed", [2, 3])
def test_asymmetric_iou_and_orientation_parity(ref_mu, seed):
    from cim_tpu.ops.mask_iou import mask_asymmetric_iou

    rng = np.random.RandomState(seed)
    masks = rng.rand(10, 16, 18) > 0.6
    # reference assembly: per-column slices concatenated on axis=1
    cols = [
        ref_mu.mask_asymmetric_iou(masks, masks[j][None])
        for j in range(len(masks))
    ]
    want = np.concatenate(cols, axis=1).astype(np.float16)
    got = np.asarray(mask_asymmetric_iou(masks, masks)).astype(np.float16)
    np.testing.assert_array_equal(got, want)
