"""Native C++ host kernels vs their numpy twins."""
import numpy as np
import pytest

native = pytest.importorskip("cim_tpu.native")


@pytest.fixture(scope="module", autouse=True)
def _built():
    try:
        native._load()
    except Exception as e:  # no compiler in env
        pytest.skip(f"native build unavailable: {e}")


def _rand_dets(rng, n):
    x1 = rng.uniform(0, 60, n)
    y1 = rng.uniform(0, 60, n)
    w = rng.uniform(5, 40, n)
    h = rng.uniform(5, 40, n)
    s = rng.rand(n)
    return np.stack([x1, y1, x1 + w, y1 + h, s], -1).astype(np.float32)


def test_native_nms_matches_numpy(rng):
    import cim_tpu.ops.nms as nms_mod

    dets = _rand_dets(rng, 200)
    got = native.nms(dets, 0.3)
    # numpy twin (bypass the native fast path inside nms_np)
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    suppressed = np.zeros(len(dets), bool)
    for _i in range(len(order)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(int(i))
        rest = order[_i + 1 :]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        iw = np.maximum(0.0, xx2 - xx1 + 1)
        ih = np.maximum(0.0, yy2 - yy1 + 1)
        inter = iw * ih
        ovr = inter / (areas[i] + areas[rest] - inter)
        suppressed[rest[ovr >= 0.3]] = True
    np.testing.assert_array_equal(got, keep)


def test_native_bbox_overlaps(rng):
    from cim_tpu.ops import boxes as box_ops
    import jax.numpy as jnp

    a = _rand_dets(rng, 20)[:, :4]
    b = _rand_dets(rng, 9)[:, :4]
    got = native.bbox_overlaps(a, b)
    want = np.asarray(box_ops.box_iou(jnp.asarray(a), jnp.asarray(b), True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_native_rle_matches_numpy(rng):
    for _ in range(5):
        m = (rng.rand(31, 17) > 0.5).astype(np.uint8)
        got = native.rle_encode_counts(m)
        flat = m.flatten(order="F")
        change = np.nonzero(np.diff(flat))[0] + 1
        runs = np.diff(np.concatenate([[0], change, [len(flat)]])).tolist()
        if flat[0] == 1:
            runs = [0] + runs
        assert got == runs


def test_native_soft_nms_linear(rng):
    from cim_tpu.ops.nms import soft_nms_np

    dets = _rand_dets(rng, 60)
    got_boxes, got_inds = native.soft_nms(dets, method=1, nt=0.3, threshold=0.01)
    want_boxes, want_inds = soft_nms_np(
        dets, overlap_thresh=0.3, score_thresh=0.01, method="linear"
    )
    np.testing.assert_array_equal(got_inds, want_inds)
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-5)


def test_native_rle_string_roundtrip_and_decode():
    native = pytest.importorskip("cim_tpu.native")
    try:
        native._load()
    except Exception:
        pytest.skip("no compiler")
    m = np.zeros((37, 53), np.uint8)
    m[5:20, 10:30] = 1
    m[0, 0] = 1  # leading-1 mask: counts start with a 0 run
    c = native.rle_encode_counts(m)
    s = native.rle_to_string(c)
    assert list(native.rle_from_string(s)) == list(c)
    np.testing.assert_array_equal(native.rle_decode_mask(c, 37, 53), m)


def test_native_rle_iou_matches_mask_math():
    native = pytest.importorskip("cim_tpu.native")
    try:
        native._load()
    except Exception:
        pytest.skip("no compiler")
    rng = np.random.RandomState(0)
    masks = []
    for _ in range(6):
        m = np.zeros((40, 60), np.uint8)
        y, x = rng.randint(0, 25), rng.randint(0, 40)
        m[y : y + rng.randint(5, 15), x : x + rng.randint(5, 20)] = 1
        masks.append(m)
    counts = [native.rle_encode_counts(m) for m in masks]
    got = native.rle_iou_counts(counts[:3], counts[3:])
    for i in range(3):
        for j in range(3):
            inter = np.logical_and(masks[i], masks[3 + j]).sum()
            uni = np.logical_or(masks[i], masks[3 + j]).sum()
            want = inter / uni if uni else 0.0
            assert abs(got[i, j] - want) < 1e-12
    # crowd semantics: union = dt area
    crowd = native.rle_iou_counts(counts[:1], counts[1:2], [1])[0, 0]
    inter = np.logical_and(masks[0], masks[1]).sum()
    assert abs(crowd - inter / masks[0].sum()) < 1e-12


def test_native_rle_decode_clamps_malformed_counts():
    """Malformed/truncated counts whose total exceeds h*w must not write
    out of bounds; the native decode clamps to the canvas exactly like
    the numpy fallback's pad/truncate (evaluation/rle.py:43-52)."""
    from cim_tpu.evaluation import rle as rle_mod

    h, w = 4, 3
    # total = 2 + 100 = 102 >> 12 = h*w; the 1-run overflows the canvas
    bad_counts = [2, 100]
    got = native.rle_decode_mask(bad_counts, h, w)
    counts = np.asarray(bad_counts, np.int64)
    vals = (np.arange(len(counts), dtype=np.uint8) & 1)
    flat = np.repeat(vals, counts)[: h * w]
    want = flat.reshape((h, w), order="F")
    np.testing.assert_array_equal(got, want)
    # short counts (total < h*w) still zero-fill the tail
    got_short = native.rle_decode_mask([1, 2], h, w)
    assert got_short.shape == (h, w) and got_short.sum() == 2


def test_iou_rle_rejects_mixed_canvases():
    """The native rle_iou walk compares runs positionally and never sees
    'size'; mixed canvases must raise instead of silently mis-scoring."""
    from cim_tpu.evaluation.rle import encode, iou_rle

    a = encode(np.ones((8, 8), np.uint8))
    b = encode(np.ones((4, 4), np.uint8))
    with pytest.raises(ValueError, match="canvas"):
        iou_rle([a], [b])
    # same canvas still fine
    iou = iou_rle([a], [a])
    assert iou.shape == (1, 1) and abs(iou[0, 0] - 1.0) < 1e-9
