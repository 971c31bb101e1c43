"""Pallas RoIAlign vs the XLA implementation (interpret mode on CPU)."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import cim_tpu.ops.pallas.roi_align_kernel as rak
from cim_tpu.ops.roi_align import roi_align


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    # run the kernel in interpreter mode on the CPU test backend
    monkeypatch.setattr(
        rak.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _case(rng, h=16, w=20, c=8, n=10):
    feat = rng.randn(h, w, c).astype(np.float32)
    x1 = rng.uniform(0, w * 16 * 0.5, n)
    y1 = rng.uniform(0, h * 16 * 0.5, n)
    bw = rng.uniform(16, w * 16 * 0.4, n)
    bh = rng.uniform(16, h * 16 * 0.4, n)
    rois = np.stack([x1, y1, x1 + bw, y1 + bh], -1).astype(np.float32)
    return feat, rois


@pytest.mark.parametrize("sampling_ratio", [0, 2])
def test_pallas_matches_xla_forward(rng, sampling_ratio):
    feat, rois = _case(rng)
    got = np.asarray(
        rak.roi_align_pallas(
            jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16, sampling_ratio,
            4, 4, 4,
        )
    )
    want = np.asarray(
        roi_align(
            jnp.asarray(feat), jnp.asarray(rois), output_size=7,
            spatial_scale=1 / 16, sampling_ratio=sampling_ratio,
            aligned=True, max_adaptive_grid=4,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_nondivisible_n_padding(rng):
    feat, rois = _case(rng, n=7)  # 7 % 4 != 0 -> padded internally
    got = np.asarray(
        rak.roi_align_pallas(jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16, 0, 4, 4, 4)
    )
    assert got.shape == (7, 7, 7, 8)
    want = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), output_size=7,
                  spatial_scale=1 / 16, max_adaptive_grid=4)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_backward_matches_xla(rng):
    feat, rois = _case(rng, h=10, w=12, c=4, n=6)
    g = rng.randn(6, 7, 7, 4).astype(np.float32)

    def loss_pallas(f):
        out = rak.roi_align_pallas(f, jnp.asarray(rois), 7, 1 / 16, 0, 4, 2, 4)
        return jnp.sum(out * jnp.asarray(g))

    def loss_xla(f):
        out = roi_align(f, jnp.asarray(rois), output_size=7,
                        spatial_scale=1 / 16, max_adaptive_grid=4)
        return jnp.sum(out * jnp.asarray(g))

    gp = np.asarray(jax.grad(loss_pallas)(jnp.asarray(feat)))
    gx = np.asarray(jax.grad(loss_xla)(jnp.asarray(feat)))
    np.testing.assert_allclose(gp, gx, rtol=1e-4, atol=1e-5)


def test_pallas_valid_hw_matches_unpadded(rng):
    """Zero-padded feature bucket + valid_hw == unpadded kernel output:
    the dynamic SMEM bounds must reproduce the border snapping of the
    true feature extent (incl. edge-touching rois)."""
    h, w, c, n = 11, 13, 8, 6
    feat = rng.randn(h, w, c).astype(np.float32)
    # rois out to the exact image border (w*16-1) exercise edge snapping
    rois = np.array(
        [
            [0, 0, w * 16 - 1, h * 16 - 1],
            [w * 8, h * 8, w * 16 - 1, h * 16 - 1],
            [0, 0, 40, 40],
            [5, 90, 200, h * 16 - 1],
            [100, 3, w * 16 - 1, 80],
            [30, 30, 120, 120],
        ],
        np.float32,
    )
    want = np.asarray(
        rak.roi_align_pallas(jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16, 0, 4, 4, 4)
    )
    feat_p = np.zeros((h + 5, w + 7, c), np.float32)
    feat_p[:h, :w] = feat
    got = np.asarray(
        rak.roi_align_pallas(
            jnp.asarray(feat_p), jnp.asarray(rois), 7, 1 / 16, 0, 4, 4, 4,
            valid_hw=(h, w),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # and against the XLA op with the same valid_hw
    xla = np.asarray(
        roi_align(
            jnp.asarray(feat_p), jnp.asarray(rois), output_size=7,
            spatial_scale=1 / 16, max_adaptive_grid=4, valid_hw=(h, w),
        )
    )
    np.testing.assert_allclose(xla, want, rtol=1e-5, atol=1e-6)


def test_pallas_valid_hw_backward(rng):
    """Gradient of the padded+valid_hw kernel matches the unpadded one on
    the valid region and is zero on the pad."""
    h, w, c, n = 9, 10, 4, 4
    feat = rng.randn(h, w, c).astype(np.float32)
    rois = np.array(
        [[0, 0, w * 16 - 1, h * 16 - 1], [10, 10, 100, 90],
         [40, 5, 150, 140], [0, 60, 80, h * 16 - 1]],
        np.float32,
    )
    g = rng.randn(n, 7, 7, c).astype(np.float32)

    def loss(f, vhw):
        out = rak.roi_align_pallas(f, jnp.asarray(rois), 7, 1 / 16, 0, 4, 2, 4,
                                   valid_hw=vhw)
        return jnp.sum(out * jnp.asarray(g))

    gu = np.asarray(jax.grad(lambda f: loss(f, None))(jnp.asarray(feat)))
    feat_p = np.zeros((h + 3, w + 6, c), np.float32)
    feat_p[:h, :w] = feat
    gp = np.asarray(jax.grad(lambda f: loss(f, (h, w)))(jnp.asarray(feat_p)))
    np.testing.assert_allclose(gp[:h, :w], gu, rtol=1e-5, atol=1e-6)
    assert np.abs(gp[h:]).max() == 0.0
    assert np.abs(gp[:, w:]).max() == 0.0
