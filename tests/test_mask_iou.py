import numpy as np
import jax.numpy as jnp

from cim_tpu.ops.mask_iou import mask_iou, mask_asymmetric_iou


def _oracle_iou(a, b):
    out = np.zeros((len(a), len(b)), np.float32)
    for i, ma in enumerate(a):
        for j, mb in enumerate(b):
            inter = np.bitwise_and(ma, mb).sum()
            union = np.bitwise_or(ma, mb).sum()
            out[i, j] = inter / union if union else 0.0
    return out


def _oracle_asy(a, b):
    # reference mask_utils.mask_asymmetric_iou: |a_i ∩ b_j| / |b_j|
    out = np.zeros((len(a), len(b)), np.float32)
    for i, ma in enumerate(a):
        for j, mb in enumerate(b):
            inter = np.bitwise_and(ma, mb).sum()
            area_b = mb.sum()
            out[i, j] = inter / area_b if area_b else 0.0
    return out


def test_mask_iou(rng):
    a = rng.rand(14, 9, 11) > 0.5
    b = rng.rand(6, 9, 11) > 0.5
    got = np.asarray(mask_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _oracle_iou(a, b), rtol=1e-5, atol=1e-6)


def test_mask_asymmetric_iou(rng):
    a = rng.rand(10, 7, 7) > 0.4
    b = rng.rand(10, 7, 7) > 0.6
    got = np.asarray(mask_asymmetric_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _oracle_asy(a, b), rtol=1e-5, atol=1e-6)


def test_asy_iou_containment_property(rng):
    # a mask fully contains its own subset -> asy[i, j] == 1 when i ⊇ j
    big = np.zeros((1, 8, 8), bool)
    big[0, 1:7, 1:7] = True
    small = np.zeros((1, 8, 8), bool)
    small[0, 2:5, 2:5] = True
    got = np.asarray(mask_asymmetric_iou(jnp.asarray(big), jnp.asarray(small)))
    assert got[0, 0] == 1.0
    got_rev = np.asarray(mask_asymmetric_iou(jnp.asarray(small), jnp.asarray(big)))
    assert got_rev[0, 0] == 9.0 / 36.0
