import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cim_tpu.ops.roi_align import roi_align, roi_pool
from tests.oracles import roi_align_oracle


def _rand_case(rng, h=24, w=32, c=5, n=12, img_scale=16):
    feat = rng.randn(h, w, c).astype(np.float32)
    x1 = rng.uniform(0, w * img_scale * 0.6, n)
    y1 = rng.uniform(0, h * img_scale * 0.6, n)
    bw = rng.uniform(8, w * img_scale * 0.35, n)
    bh = rng.uniform(8, h * img_scale * 0.35, n)
    rois = np.stack([x1, y1, x1 + bw, y1 + bh], -1).astype(np.float32)
    return feat, rois


@pytest.mark.parametrize("sampling_ratio", [2, 1])
@pytest.mark.parametrize("aligned", [True, False])
def test_roi_align_matches_oracle_fixed_grid(rng, sampling_ratio, aligned):
    feat, rois = _rand_case(rng)
    got = np.asarray(
        roi_align(
            jnp.asarray(feat),
            jnp.asarray(rois),
            output_size=7,
            spatial_scale=1 / 16,
            sampling_ratio=sampling_ratio,
            aligned=aligned,
        )
    )
    want = roi_align_oracle(feat, rois, 7, 1 / 16, sampling_ratio, aligned)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_adaptive_matches_oracle_when_within_cap(rng):
    # small ROIs -> adaptive grid = ceil(bin) <= cap -> exact mmcv semantics
    feat, _ = _rand_case(rng)
    n = 10
    x1 = rng.uniform(0, 200, n)
    y1 = rng.uniform(0, 150, n)
    bw = rng.uniform(16, 220, n)  # <= 14 feature px -> ceil(bin) <= 2
    bh = rng.uniform(16, 220, n)
    rois = np.stack([x1, y1, x1 + bw, y1 + bh], -1).astype(np.float32)
    got = np.asarray(
        roi_align(
            jnp.asarray(feat),
            jnp.asarray(rois),
            output_size=7,
            spatial_scale=1 / 16,
            sampling_ratio=0,
            aligned=True,
            max_adaptive_grid=2,
        )
    )
    want = roi_align_oracle(feat, rois, 7, 1 / 16, 0, True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_adaptive_capped_is_subsampled_average(rng):
    # large ROIs beyond the cap: average over the capped grid, per the oracle
    feat, _ = _rand_case(rng)
    rois = np.array([[0, 0, 500, 380], [16, 16, 480, 360]], np.float32)
    got = np.asarray(
        roi_align(
            jnp.asarray(feat),
            jnp.asarray(rois),
            output_size=7,
            spatial_scale=1 / 16,
            sampling_ratio=0,
            max_adaptive_grid=2,
        )
    )
    want = roi_align_oracle(feat, rois, 7, 1 / 16, 0, True, grid_cap=2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_grad_is_finite_and_nonzero(rng):
    feat, rois = _rand_case(rng, h=10, w=12, c=3, n=4)

    def loss(f):
        out = roi_align(f, jnp.asarray(rois), output_size=7, spatial_scale=1 / 16)
        return jnp.sum(out**2)

    g = jax.grad(loss)(jnp.asarray(feat))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_roi_pool_simple_exact():
    # 4x4 feature map, one ROI covering the full map, 2x2 output.
    feat = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    rois = np.array([[0, 0, 3 * 16, 3 * 16]], np.float32)  # rounds to cells 0..3
    out = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), output_size=2))
    want = np.array([[5, 7], [13, 15]], np.float32)[..., None]
    np.testing.assert_allclose(out[0], want)
