"""Golden tests for the data layer (VERDICT round-1 gaps):

- transforms.prep_image vs a transliteration of the reference's
  prep_im_for_blob (lib/utils/blob.py:93-147) — pixel-exact, both modes,
  including the float-resize-then-uint8-truncate order of the ToTensor
  path;
- roidb.extend_with_flipped_entries vs lib/datasets/roidb.py:74-115 —
  flip-augmentation errors are silent mAP killers.
"""
import numpy as np
import pytest

from cim_tpu.data.roidb import extend_with_flipped_entries, filter_for_training
from cim_tpu.data.transforms import (
    TORCH_MEAN,
    TORCH_STD,
    prep_image,
    prep_image_uint8_rgb,
    scale_for_target,
)

cv2 = pytest.importorskip("cv2")


def _oracle_prep(im, pixel_means, target_size, mode):
    """Transliteration of prep_im_for_blob (blob.py:101-142); the
    torchvision ToTensor+Normalize pair is the exact /255-then-(x-m)/s."""
    im_size_max = float(max(im.shape[0], im.shape[1]))
    im_scale = float(target_size) / im_size_max  # blob.py:162-169 (no cap)
    if mode == "org":
        imf = im.astype(np.float32) - np.asarray(pixel_means, np.float32)
        out = cv2.resize(imf, None, None, fx=im_scale, fy=im_scale,
                         interpolation=cv2.INTER_LINEAR)
        return out, im_scale
    imf = im.astype(np.float32)
    im_r = np.uint8(cv2.resize(imf, None, None, fx=im_scale, fy=im_scale,
                               interpolation=cv2.INTER_LINEAR))
    im_rgb = cv2.cvtColor(im_r, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    return (im_rgb - np.asarray(TORCH_MEAN)) / np.asarray(TORCH_STD), im_scale


@pytest.mark.parametrize("target", [480, 576, 1200])
def test_prep_image_totensor_pixel_exact(rng, target):
    im = (rng.rand(375, 500, 3) * 255).astype(np.uint8)
    want, im_scale = _oracle_prep(im, None, target, "ToTensor")
    s = scale_for_target(im.shape[:2], target, 2000)
    assert s == im_scale
    got = prep_image(im, s, "ToTensor", None)
    np.testing.assert_array_equal(got, want.astype(np.float32))
    # the split host/device path: uint8 RGB host half must match the
    # pre-normalization uint8 stage exactly
    got_u8 = prep_image_uint8_rgb(im, s)
    im_r = np.uint8(cv2.resize(im.astype(np.float32), None, None, fx=s, fy=s,
                               interpolation=cv2.INTER_LINEAR))
    np.testing.assert_array_equal(got_u8, cv2.cvtColor(im_r, cv2.COLOR_BGR2RGB))


def test_prep_image_org_pixel_exact(rng):
    im = (rng.rand(375, 500, 3) * 255).astype(np.uint8)
    means = [[102.9801, 115.9465, 122.7717]]
    want, im_scale = _oracle_prep(im, means, 480, "org")
    got = prep_image(im, im_scale, "org", means)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_extend_with_flipped_entries_golden(rng):
    n, w, h = 12, 100, 80
    x1 = rng.uniform(0, 40, n).astype(np.float32)
    y1 = rng.uniform(0, 40, n).astype(np.float32)
    boxes = np.stack([x1, y1, x1 + 30, y1 + 30], -1)
    masks = (rng.rand(n, 7, 7) > 0.5).astype(np.float32)
    gt_boxes = np.array([[5, 5, 20, 20, 1]], np.float32)
    entry = {
        "id": 7,
        "width": w,
        "height": h,
        "image": "x.jpg",
        "flipped": False,
        "boxes": boxes.copy(),
        "gt_boxes": gt_boxes.copy(),
        "masks": masks.copy(),
        "gt_classes": np.ones((1, 20), np.int32),
        "mat": np.zeros((n, 21), np.float32),
    }
    roidb = [entry]
    extend_with_flipped_entries(roidb)
    assert len(roidb) == 2
    fe = roidb[1]
    assert fe["flipped"] is True
    # reference roidb.py:85-89: x1' = W - x2 - 1, x2' = W - x1 - 1
    np.testing.assert_allclose(fe["boxes"][:, 0], w - boxes[:, 2] - 1)
    np.testing.assert_allclose(fe["boxes"][:, 2], w - boxes[:, 0] - 1)
    np.testing.assert_allclose(fe["boxes"][:, 1], boxes[:, 1])
    np.testing.assert_allclose(fe["boxes"][:, 3], boxes[:, 3])
    assert (fe["boxes"][:, 2] >= fe["boxes"][:, 0]).all()
    # gt_boxes flipped the same way (roidb.py:93-98); trailing cols kept
    np.testing.assert_allclose(fe["gt_boxes"][0, 0], w - gt_boxes[0, 2] - 1)
    np.testing.assert_allclose(fe["gt_boxes"][0, 2], w - gt_boxes[0, 0] - 1)
    np.testing.assert_allclose(fe["gt_boxes"][0, 4], gt_boxes[0, 4])
    # masks: np.flip(masks, 2) (roidb.py:100-101)
    np.testing.assert_array_equal(fe["masks"], np.flip(masks, 2))
    # untouched keys shared, original entry unmodified
    assert fe["id"] == 7 and fe["image"] == "x.jpg"
    np.testing.assert_array_equal(roidb[0]["boxes"], boxes)
    # double flip is the identity (up to f32 rounding of W - x - 1)
    roidb2 = [fe]
    extend_with_flipped_entries(roidb2)
    np.testing.assert_allclose(roidb2[1]["boxes"], boxes, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(roidb2[1]["masks"], masks)


def test_filter_for_training_drops_unlabeled():
    mk = lambda s: {"gt_classes": np.array([[s, 0]], np.int32)}
    kept = filter_for_training([mk(1), mk(0), mk(1)])
    assert len(kept) == 2
