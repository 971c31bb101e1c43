"""Mask IoU / asymmetric IoU as batched einsums.

The reference computes per-image N x N mask-IoU matrices offline on GPU with a
python double loop over cupy masks (lib/utils/mask_utils.py:6-32, driven by
tools/pre/create_cob_iou.py / create_cob_asy_iou.py). Here the same
quantities are single einsums on flattened boolean masks — they jit onto the
TPU MXU and vmap over images.

Conventions (reference lib/utils/mask_utils.py):
  mask_iou(a, b)[i, j]            = |a_i ∩ b_j| / |a_i ∪ b_j|
  mask_asymmetric_iou(a, b)[i, j] = |a_i ∩ b_j| / |b_j|
    (i.e. "to what extent the i-th mask contains the j-th",
     cf. the Note at lib/modeling/heads.py:385)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _flatten(masks):
    n = masks.shape[0]
    return masks.reshape(n, -1).astype(jnp.float32)


@jax.jit
def mask_iou(masks_a, masks_b):
    """(N,H,W) x (K,H,W) boolean/float masks -> (N,K) IoU (float32)."""
    a = _flatten(masks_a)
    b = _flatten(masks_b)
    inter = jax.lax.dot(a, b.T, precision=jax.lax.Precision.HIGHEST)
    area_a = jnp.sum(a, axis=-1)
    area_b = jnp.sum(b, axis=-1)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@jax.jit
def mask_asymmetric_iou(masks_a, masks_b):
    """(N,H,W) x (K,H,W) -> (N,K): |a_i ∩ b_j| / |b_j| ("a contains b")."""
    a = _flatten(masks_a)
    b = _flatten(masks_b)
    inter = jax.lax.dot(a, b.T, precision=jax.lax.Precision.HIGHEST)
    area_b = jnp.sum(b, axis=-1)
    return jnp.where(area_b[None, :] > 0, inter / area_b[None, :], 0.0)
