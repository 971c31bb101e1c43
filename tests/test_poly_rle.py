"""Polygon -> RLE rasterization (pycocotools frPyObjects semantics).

pycocotools is not installed here; these tests pin the semantics with
(a) exactly-known rectangle cases, (b) a center-point even-odd oracle
with mismatches allowed only on the boundary ring (the upsampled-boundary
algorithm and naive center sampling may disagree by at most the boundary
pixels), and (c) structural identities (merge == union, round-trips).
"""
import numpy as np
import pytest

from cim_tpu.evaluation import rle


def _decode_poly(poly, h, w):
    return rle.decode(rle.poly_to_rle(poly, h, w))


def _center_oracle(poly, h, w):
    """Even-odd fill by pixel-center point-in-polygon (matplotlib-free)."""
    xy = np.asarray(poly, np.float64).reshape(-1, 2)
    k = len(xy)
    out = np.zeros((h, w), np.uint8)
    cx = np.arange(w) + 0.0
    cy = np.arange(h) + 0.0
    for i in range(h):
        for j in range(w):
            px, py = cx[j], cy[i]
            inside = False
            for e in range(k):
                x1, y1 = xy[e]
                x2, y2 = xy[(e + 1) % k]
                if (y1 > py) != (y2 > py):
                    xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                    if px < xint:
                        inside = not inside
            out[i, j] = inside
    return out


def _boundary_ring(poly, h, w, width=1.0):
    """Pixels whose center is within `width` of any polygon edge."""
    xy = np.asarray(poly, np.float64).reshape(-1, 2)
    k = len(xy)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    ring = np.zeros((h, w), bool)
    for e in range(k):
        p1 = xy[e]
        p2 = xy[(e + 1) % k]
        d = p2 - p1
        L2 = max((d**2).sum(), 1e-12)
        t = np.clip(((xx - p1[0]) * d[0] + (yy - p1[1]) * d[1]) / L2, 0, 1)
        dist = np.hypot(xx - (p1[0] + t * d[0]), yy - (p1[1] + t * d[1]))
        ring |= dist <= width
    return ring


def test_full_image_rectangle():
    h, w = 13, 17
    poly = [0, 0, w, 0, w, h, 0, h]
    assert _decode_poly(poly, h, w).all()


@pytest.mark.parametrize("rect", [(1, 1, 3, 3), (2, 0, 7, 4), (0, 2, 5, 9)])
def test_integer_rectangle_covers_halfopen_range(rect):
    """Integer-corner rectangle [x0,y0,x1,y1] fills [y0:y1, x0:x1]
    (pycocotools convention: the x1/y1 edge pixels are excluded)."""
    x0, y0, x1, y1 = rect
    h, w = 10, 10
    poly = [x0, y0, x1, y0, x1, y1, x0, y1]
    m = _decode_poly(poly, h, w)
    want = np.zeros((h, w), np.uint8)
    want[y0:y1, x0:x1] = 1
    np.testing.assert_array_equal(m, want)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_polygons_match_center_oracle_off_boundary(seed):
    rng = np.random.RandomState(seed)
    h, w = 24, 30
    # star-shaped polygon around a center: strictly simple (non-crossing)
    cx, cy = 15.0, 12.0
    k = rng.randint(5, 9)
    angles = np.sort(rng.uniform(0, 2 * np.pi, k))
    radii = rng.uniform(4, 10, k)
    poly = np.stack(
        [cx + radii * np.cos(angles), cy + radii * np.sin(angles)], -1
    ).reshape(-1)
    got = _decode_poly(poly, h, w)
    want = _center_oracle(poly, h, w)
    ring = _boundary_ring(poly, h, w, width=1.0)
    # interior/exterior pixels must agree exactly
    np.testing.assert_array_equal(got[~ring], want[~ring])
    # and the boundary band disagreement stays small
    assert (got != want).mean() < 0.06


def test_merge_is_union():
    h, w = 12, 12
    p1 = [1, 1, 5, 1, 5, 5, 1, 5]
    p2 = [7, 7, 11, 7, 11, 11, 7, 11]
    merged = rle.decode(rle.fr_poly_objects([p1, p2], h, w))
    want = _decode_poly(p1, h, w) | _decode_poly(p2, h, w)
    np.testing.assert_array_equal(merged, want)


def test_fr_poly_objects_uncompressed_rle_passthrough():
    h, w = 6, 7
    m = (np.arange(h * w).reshape(h, w) % 3 == 0).astype(np.uint8)
    counts = rle.mask_to_rle_counts(m)
    out = rle.fr_poly_objects({"size": [h, w], "counts": counts}, h, w)
    assert isinstance(out["counts"], str)
    np.testing.assert_array_equal(rle.decode(out), m)


def test_coco_annToRLE_polygon_gt():
    """COCO gt json with polygon segmentations now evaluates (VERDICT
    round-1 gap: evaluation/coco.py raised NotImplementedError)."""
    from cim_tpu.evaluation.coco import COCO

    h, w = 16, 20
    poly = [2, 2, 10, 2, 10, 9, 2, 9]
    dataset = {
        "images": [{"id": 1, "height": h, "width": w}],
        "categories": [{"id": 1, "name": "thing"}],
        "annotations": [
            {
                "id": 1,
                "image_id": 1,
                "category_id": 1,
                "iscrowd": 0,
                "area": 56,
                "bbox": [2, 2, 8, 7],
                "segmentation": [poly],
            }
        ],
    }
    coco = COCO(dataset)
    r = coco.annToRLE(coco.anns[1])
    m = rle.decode(r)
    want = np.zeros((h, w), np.uint8)
    want[2:9, 2:10] = 1
    np.testing.assert_array_equal(m, want)
    # mask IoU of gt-vs-itself through the eval path
    assert rle.iou_rle([r], [r], [0])[0, 0] == 1.0
