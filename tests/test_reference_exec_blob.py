"""Golden parity against the *executed* reference image pipeline.

/root/reference/lib/utils/blob.py is imported and run directly (with
/root/reference/lib on sys.path for its `core.config` import and a
faithful minimal torchvision.transforms stub) as the oracle for
cim_tpu.data.transforms. Pixel-exact agreement here is what makes every
downstream mAP comparable: the "ToTensor" path's quirky
float-resize-then-uint8-truncate + BGR->RGB + ImageNet normalize
(blob.py:117-147) and the "org" path's mean-subtract-then-resize
(blob.py:102-115) both feed the backbones.

The stub implements the documented torchvision semantics the reference
composes (ToTensor: HWC uint8 -> CHW float/255; Normalize: per-channel
(x-mean)/std) — the logic under test lives in blob.py itself.
"""
from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

from cim_tpu.data.transforms import prep_image, scale_for_target

REF_LIB = "/root/reference/lib"
REF_BLOB = REF_LIB + "/utils/blob.py"

cv2 = pytest.importorskip("cv2")


class _ToTensor:
    def __call__(self, a):
        assert a.dtype == np.uint8
        return torch.from_numpy(
            a.transpose(2, 0, 1).astype(np.float32) / 255.0
        )


class _Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std


class _Compose:
    def __init__(self, ts):
        self.ts = ts

    def __call__(self, x):
        for t in self.ts:
            x = t(x)
        return x


@pytest.fixture(scope="module")
def ref_blob():
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.ToTensor = _ToTensor
    tr.Normalize = _Normalize
    tr.Compose = _Compose
    tv.transforms = tr
    # torch._six was removed from modern torch; the reference's nn package
    # (pulled in by core.config's `import nn as mynn`) still imports
    # string_classes from it, which was simply `str`
    six_shim = types.ModuleType("torch._six")
    six_shim.string_classes = str
    six_shim.int_classes = int
    had = {
        k: sys.modules.get(k)
        for k in ("torchvision", "torchvision.transforms", "torch._six")
    }
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torch._six"] = six_shim
    sys.path.insert(0, REF_LIB)
    try:
        spec = importlib.util.spec_from_file_location("_ref_blob", REF_BLOB)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF_LIB)
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def _image(rng, h, w):
    return (rng.rand(h, w, 3) * 255).astype(np.uint8)  # BGR


@pytest.mark.parametrize("hw,target", [
    ((375, 500), 480), ((500, 375), 688), ((333, 500), 1200),
    ((100, 100), 576), ((480, 640), 864),
])
def test_target_scale_parity(ref_blob, hw, target):
    want = ref_blob.get_target_scale(min(hw), max(hw), target, 2000)
    got = scale_for_target(hw, target, 2000)
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("target", [480, 688, 1200])
def test_prep_org_mode_pixel_exact(ref_blob, seed, target):
    """"org" mode: float32, minus Detectron pixel means, THEN resize
    (blob.py:102-115)."""
    rng = np.random.RandomState(seed)
    im = _image(rng, 375, 500)
    pixel_means = np.array([[[102.9801, 115.9465, 122.7717]]])
    ims, scales = ref_blob.prep_im_for_blob(
        im.astype(np.float32).copy(), pixel_means, [target], 2000, "org"
    )
    s = scale_for_target((375, 500), target, 2000)
    assert scales[0] == s
    got = prep_image(im, s, "org", pixel_means=pixel_means.reshape(3))
    np.testing.assert_allclose(got, ims[0], rtol=0, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("target,hw", [
    (480, (375, 500)), (688, (375, 500)), (1200, (333, 500)),
    (576, (480, 640)),
])
def test_prep_totensor_mode_pixel_exact(ref_blob, seed, target, hw):
    """"ToTensor" mode (all shipped configs): float-resize, uint8
    TRUNCATION (np.uint8 cast), BGR->RGB, /255 + ImageNet normalize
    (blob.py:117-147) — pixel-exact against the executed reference."""
    rng = np.random.RandomState(seed)
    im = _image(rng, *hw)
    ims, scales = ref_blob.prep_im_for_blob(
        im.astype(np.float32).copy(), None, [target], 2000, "ToTensor"
    )
    s = scale_for_target(hw, target, 2000)
    assert scales[0] == s
    got = prep_image(im, s, "ToTensor")
    np.testing.assert_allclose(got, ims[0], rtol=0, atol=1e-6)


def test_prep_totensor_identity_scale(ref_blob):
    """scale == 1.0 skips the resize on our side; the reference still
    round-trips through cv2.resize — values must agree anyway."""
    rng = np.random.RandomState(3)
    im = _image(rng, 500, 500)
    ims, _ = ref_blob.prep_im_for_blob(
        im.astype(np.float32).copy(), None, [500], 2000, "ToTensor"
    )
    got = prep_image(im, 1.0, "ToTensor")
    np.testing.assert_allclose(got, ims[0], rtol=0, atol=1e-6)


def test_im_list_to_blob_padding(ref_blob):
    """Zero-pad to the max shape, NCHW (blob.py:57-81)."""
    rng = np.random.RandomState(4)
    a = rng.rand(40, 60, 3).astype(np.float32)
    b = rng.rand(50, 30, 3).astype(np.float32)
    blob = ref_blob.im_list_to_blob([a, b])
    assert blob.shape == (2, 50, 60, 3)[0:1] + (3, 50, 60)
    np.testing.assert_array_equal(blob[0, :, :40, :60], a.transpose(2, 0, 1))
    np.testing.assert_array_equal(blob[1, :, :50, :30], b.transpose(2, 0, 1))
    assert (blob[0, :, 40:, :] == 0).all() and (blob[1, :, :, 30:] == 0).all()
