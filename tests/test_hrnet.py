import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cim_tpu.models.hrnet import HRNetW48, frozen_param_paths

# reduced stage config: same topology as W48, tiny widths/depths so the
# CPU test backend compiles in seconds
TINY_STAGES = {
    "STAGE1": {"NUM_MODULES": 1, "NUM_BRANCHES": 1, "BLOCK": "BOTTLENECK",
               "NUM_BLOCKS": [1], "NUM_CHANNELS": [8]},
    "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
               "NUM_BLOCKS": [1, 1], "NUM_CHANNELS": [8, 16]},
    "STAGE3": {"NUM_MODULES": 1, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
               "NUM_BLOCKS": [1, 1, 1], "NUM_CHANNELS": [8, 16, 32]},
    "STAGE4": {"NUM_MODULES": 1, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
               "NUM_BLOCKS": [1, 1, 1, 1], "NUM_CHANNELS": [8, 16, 32, 64]},
}


def test_hrnet_tiny_shapes(rng):
    model = HRNetW48(stages=TINY_STAGES)
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 2, 3, 2048)  # stride 32, dim 2048


def test_hrnet_pads_to_32(rng):
    model = HRNetW48(stages=TINY_STAGES)
    x = jnp.asarray(rng.randn(1, 50, 70, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    # 50 -> 64, 70 -> 96 (pad), /32
    assert out.shape == (1, 2, 3, 2048)


@pytest.mark.slow
def test_hrnet_w48_param_count(rng):
    model = HRNetW48()
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x)
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"])
    )
    # HRNet-W48 classification trunk ~ 77.5M params (incl. head)
    assert 70e6 < n_params < 85e6


def test_frozen_paths():
    assert frozen_param_paths(2) == ["stem1", "stem2", "layer1", "stage2"]
    assert frozen_param_paths(0) == []
