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
