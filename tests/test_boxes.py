import numpy as np
import jax.numpy as jnp

from cim_tpu.ops import boxes as box_ops


def _rand_boxes(rng, n, size=100):
    x1 = rng.uniform(0, size * 0.7, n)
    y1 = rng.uniform(0, size * 0.7, n)
    w = rng.uniform(1, size * 0.3, n)
    h = rng.uniform(1, size * 0.3, n)
    return np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)


def _iou_oracle(a, b, plus_one):
    off = 1.0 if plus_one else 0.0
    out = np.zeros((len(a), len(b)), np.float32)
    for i, ba in enumerate(a):
        for j, bb in enumerate(b):
            iw = min(ba[2], bb[2]) - max(ba[0], bb[0]) + off
            ih = min(ba[3], bb[3]) - max(ba[1], bb[1]) + off
            if iw > 0 and ih > 0:
                area_a = (ba[2] - ba[0] + off) * (ba[3] - ba[1] + off)
                area_b = (bb[2] - bb[0] + off) * (bb[3] - bb[1] + off)
                out[i, j] = iw * ih / (area_a + area_b - iw * ih)
    return out


def test_box_iou_both_conventions(rng):
    a = _rand_boxes(rng, 17)
    b = _rand_boxes(rng, 9)
    for plus_one in (False, True):
        got = np.asarray(box_ops.box_iou(jnp.asarray(a), jnp.asarray(b), plus_one))
        want = _iou_oracle(a, b, plus_one)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_box_iou_against_torch_oracle(rng):
    # same math torchvision.ops.box_iou implements (no +1), in torch CPU
    import torch

    a = _rand_boxes(rng, 25)
    b = _rand_boxes(rng, 13)
    got = np.asarray(box_ops.box_iou(jnp.asarray(a), jnp.asarray(b)))
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    area_a = (ta[:, 2] - ta[:, 0]) * (ta[:, 3] - ta[:, 1])
    area_b = (tb[:, 2] - tb[:, 0]) * (tb[:, 3] - tb[:, 1])
    lt = torch.max(ta[:, None, :2], tb[None, :, :2])
    rb = torch.min(ta[:, None, 2:], tb[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    want = (inter / (area_a[:, None] + area_b[None, :] - inter)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_xyxy_xywh_roundtrip(rng):
    a = _rand_boxes(rng, 11)
    xywh = np.asarray(box_ops.xyxy_to_xywh(jnp.asarray(a)))
    back = np.asarray(box_ops.xywh_to_xyxy(jnp.asarray(xywh)))
    np.testing.assert_allclose(back, a, rtol=1e-5, atol=1e-4)


def test_flip_boxes_involution(rng):
    a = _rand_boxes(rng, 11)
    w = 120
    flipped = np.asarray(box_ops.flip_boxes(jnp.asarray(a), w))
    back = np.asarray(box_ops.flip_boxes(jnp.asarray(flipped), w))
    np.testing.assert_allclose(back, a, rtol=1e-5, atol=1e-5)
    # reference semantics: x1' = W - x2 - 1
    np.testing.assert_allclose(flipped[:, 0], w - a[:, 2] - 1, rtol=1e-6)
    np.testing.assert_allclose(flipped[:, 2], w - a[:, 0] - 1, rtol=1e-6)


def test_clip_boxes():
    b = jnp.asarray([[-5.0, -3.0, 250.0, 180.0]])
    out = np.asarray(box_ops.clip_boxes(b, 100, 200))
    np.testing.assert_allclose(out, [[0, 0, 199, 99]])
