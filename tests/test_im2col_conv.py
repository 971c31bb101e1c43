"""_Im2ColConv is a bit-compatible stand-in for the canonical nn.Conv
spelling: identical param tree/init, equal forward output, and equal
gradients (it exists because XLA:CPU's weight-grad conv for the
canonical spelling falls back to a naive scalar loop; see
cim_tpu/models/layers.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cim_tpu.models.layers import TorchConv


def _make(im2col, dtype=None):
    return TorchConv(8, (3, 3), padding=1, dtype=dtype, im2col=im2col)


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_forward_matches_nn_conv(dtype):
    x = jnp.asarray(np.random.RandomState(0).randn(4, 7, 7, 6), jnp.float32)
    ref = _make(False, dtype)
    alt = _make(True, dtype)
    vref = ref.init(jax.random.PRNGKey(3), x)
    valt = alt.init(jax.random.PRNGKey(3), x)
    # identical param tree AND identical init values (same scope path)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: a.shape == b.shape and jnp.allclose(a, b),
                     vref, valt))
    yr = ref.apply(vref, x)
    ya = alt.apply(vref, x)  # transplant: same params drive both
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(yr, np.float32),
                               np.asarray(ya, np.float32), rtol=tol, atol=tol)


def test_gradients_match_nn_conv():
    x = jnp.asarray(np.random.RandomState(1).randn(3, 7, 7, 5), jnp.float32)
    ref = _make(False)
    alt = _make(True)
    v = ref.init(jax.random.PRNGKey(0), x)

    def loss(fn, params, xx):
        y = fn.apply(params, xx)
        return jnp.sum(y * jnp.cos(y))

    gr_p, gr_x = jax.grad(lambda p, xx: loss(ref, p, xx), argnums=(0, 1))(v, x)
    ga_p, ga_x = jax.grad(lambda p, xx: loss(alt, p, xx), argnums=(0, 1))(v, x)
    for a, b in zip(jax.tree.leaves(gr_p), jax.tree.leaves(ga_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr_x), np.asarray(ga_x),
                               rtol=1e-4, atol=1e-5)
