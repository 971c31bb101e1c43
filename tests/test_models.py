import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cim_tpu.config import load_cfg
from cim_tpu.models import CIMModel, DilatedVGG16, ResNet50C4, build_model

import os

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_resnet50_c4_shapes_and_params(rng):
    model = ResNet50C4()
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 4, 6, 1024)  # stride 16
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # torchvision resnet50 conv1..layer3 trunk (incl. BN affine)
    assert 8.0e6 < n_params < 9.0e6
    # frozen statistics live outside params
    assert "stats" in variables


def test_vgg16_shapes(rng):
    model = DilatedVGG16()
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 8, 8, 512)  # stride 8
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert 14.5e6 < n_params < 15.0e6  # vgg16 conv trunk = 14.71M


@pytest.mark.parametrize("conv_body", ["resnet50.torch_resnet50"])
def test_cim_model_forward(rng, conv_body):
    n, c = 32, 20
    model = CIMModel(conv_body=conv_body, num_classes=c, refine_times=3)
    image = jnp.asarray(rng.randn(96, 128, 3).astype(np.float32))
    rois = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, 60, n),
                rng.uniform(0, 40, n),
                rng.uniform(64, 127, n),
                rng.uniform(48, 95, n),
            ],
            -1,
        ).astype(np.float32)
    )
    masks = jnp.asarray(rng.rand(n, 7, 7).astype(np.float32) > 0.5)
    valid = jnp.asarray(np.arange(n) < 28)

    variables = model.init(jax.random.PRNGKey(0), image, rois, masks, valid)
    out = model.apply(variables, image, rois, masks, valid)
    assert out["predict_cls"].shape == (n, c + 1)
    assert out["predict_det"].shape == (n, c + 1)
    assert out["refine_cls"].shape == (3, n, c + 1)
    assert out["refine_iou"].shape == (3, n, c + 1)

    pc = np.asarray(out["predict_cls"])
    np.testing.assert_allclose(pc.sum(-1), 1.0, rtol=1e-4)  # class softmax
    pd = np.asarray(out["predict_det"])
    np.testing.assert_allclose(pd.sum(0), 1.0, rtol=1e-4)  # proposal softmax
    # padded rows get ~zero detector mass
    assert pd[28:].max() < 1e-6
    ri = np.asarray(out["refine_iou"])
    assert (ri > 0).all() and (ri < 1).all()  # sigmoid


def test_build_model_from_cfg():
    cfg = load_cfg(os.path.join(CONFIG_DIR, "resnet50_voc.yaml"))
    model = build_model(cfg)
    assert model.num_classes == 20
    assert model.refine_times == 3
    assert model.roi_method == "RoIAlign"
