import numpy as np
import jax.numpy as jnp

from cim_tpu.ops import boxes as box_ops
from cim_tpu.ops.nms import (
    greedy_nms,
    greedy_nms_from_iou,
    keep_mask_to_indices,
    nms_np,
    soft_nms_np,
)


def _rand_dets(rng, n, size=100):
    x1 = rng.uniform(0, size * 0.6, n)
    y1 = rng.uniform(0, size * 0.6, n)
    w = rng.uniform(5, size * 0.4, n)
    h = rng.uniform(5, size * 0.4, n)
    s = rng.uniform(0, 1, n)
    return np.stack([x1, y1, x1 + w, y1 + h, s], -1).astype(np.float32)


def _greedy_oracle_from_iou(iou, scores, thresh):
    """Reference instance_nms semantics (heads.py:237-258): greedy over
    descending scores, suppress when iou >= thresh."""
    order = np.argsort(-scores, kind="stable")
    kept = []
    alive = list(order)
    while alive:
        i = alive.pop(0)
        kept.append(i)
        alive = [j for j in alive if iou[i, j] < thresh]
    return sorted(kept)


def test_greedy_nms_from_iou_matches_oracle(rng):
    n = 50
    masks = rng.rand(n, 12, 12) > 0.5
    flat = masks.reshape(n, -1).astype(np.float64)
    inter = flat @ flat.T
    union = flat.sum(-1)[:, None] + flat.sum(-1)[None, :] - inter
    iou = (inter / np.maximum(union, 1)).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    for thresh in (0.25, 0.45, 0.7):
        keep = np.asarray(greedy_nms_from_iou(jnp.asarray(iou), jnp.asarray(scores), thresh))
        want = _greedy_oracle_from_iou(iou, scores, thresh)
        assert sorted(np.nonzero(keep)[0].tolist()) == want


def test_greedy_nms_with_padding(rng):
    n, pad = 30, 20
    dets = _rand_dets(rng, n)
    iou = np.asarray(box_ops.box_iou(jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, :4])))
    want = _greedy_oracle_from_iou(iou, dets[:, 4], 0.5)

    dets_pad = np.concatenate([dets, rng.rand(pad, 5).astype(np.float32) * 100], 0)
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    keep = np.asarray(
        greedy_nms(
            jnp.asarray(dets_pad[:, :4]),
            jnp.asarray(dets_pad[:, 4]),
            0.5,
            valid=jnp.asarray(valid),
        )
    )
    assert not keep[n:].any()
    assert sorted(np.nonzero(keep)[0].tolist()) == want


def test_greedy_nms_keep_order(rng):
    dets = _rand_dets(rng, 80)
    keep = np.asarray(greedy_nms(jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]), 0.5))
    got = keep_mask_to_indices(keep, dets[:, 4])
    # indices come back in descending score order
    assert (np.diff(dets[got, 4]) <= 0).all()


def test_nms_np_plus_one_convention():
    # Hand-computed: two unit boxes with +1 convention.
    # box A = [0,0,9,9] area 100; box B = [0,0,4,9] area 50; inter (5x10)=50
    # iou = 50/(100+50-50) = 0.5
    dets = np.array(
        [[0, 0, 9, 9, 0.9], [0, 0, 4, 9, 0.8]], dtype=np.float32
    )
    assert nms_np(dets, 0.5) == [0]  # suppressed at ovr >= thresh
    assert nms_np(dets, 0.51) == [0, 1]


def test_nms_np_matches_device_nms(rng):
    dets = _rand_dets(rng, 60)
    for thresh in (0.3, 0.5):
        host = sorted(nms_np(dets, thresh))
        keep = np.asarray(
            greedy_nms(
                jnp.asarray(dets[:, :4]),
                jnp.asarray(dets[:, 4]),
                thresh,
                legacy_plus_one=True,
            )
        )
        assert sorted(np.nonzero(keep)[0].tolist()) == host


def test_soft_nms_hard_equals_nms(rng):
    dets = _rand_dets(rng, 40)
    _, keep = soft_nms_np(dets, overlap_thresh=0.3, score_thresh=0.01, method="hard")
    want = nms_np(dets, 0.3)
    # soft-NMS "hard" with a score floor prunes the same set when no
    # surviving score is below the floor
    assert sorted(keep.tolist()) == sorted(want)
