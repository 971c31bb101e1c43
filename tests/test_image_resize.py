"""Matmul resize == gather resize (exact tap parity).

resize_bilinear_dynamic (two-matmul separable form, the fused-TTA hot
path) must reproduce the gather formulation bit-for-bit up to f32
accumulation order, across upscale/downscale, dynamic valid extents,
hflip, and edge-clamp cases."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cim_tpu.ops.image import resize_bilinear_dynamic, resize_bilinear_gather


@pytest.mark.parametrize("hflip", [False, True])
@pytest.mark.parametrize(
    "src_hw,valid_hw,out_hw,target",
    [
        ((128, 128), (96, 128), (256, 192), 250.0),  # upscale
        ((128, 128), (128, 100), (64, 64), 40.0),  # downscale
        ((128, 128), (128, 128), (128, 128), 128.0),  # identity-ish
        ((64, 128), (50, 127), (192, 320), 300.0),  # odd extents
        ((32, 32), (1, 32), (64, 64), 48.0),  # 1-row source (edge clamp)
    ],
)
def test_matmul_matches_gather(src_hw, valid_hw, out_hw, target, hflip):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(*src_hw, 3).astype(np.float32) * 255.0)
    scale = jnp.float32(target) / jnp.float32(max(valid_hw))

    got, (gh, gw) = jax.jit(
        lambda im: resize_bilinear_dynamic(im, out_hw, scale, valid_hw,
                                           hflip=hflip)
    )(img)
    want, (wh, ww) = jax.jit(
        lambda im: resize_bilinear_gather(im, out_hw, scale, valid_hw,
                                          hflip=hflip)
    )(img)
    assert int(gh) == int(wh) and int(gw) == int(ww)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-3
    )
