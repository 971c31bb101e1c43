"""Backbone forward parity vs the *executed* reference models.

lib/modeling/vgg16.py (dilated conv5 body) and lib/modeling/HRNet.py
(HighResolutionNet) import only torch + the reference's own packages, so
the real torch modules run directly: random-initialized, their
state_dicts converted through cim_tpu.utils.torch_weights, and the
forward outputs compared feature-by-feature against the flax backbones.
This closes the loop the weight-converter tests alone cannot: identical
weights AND identical computation.

(resnet50 is excluded: the reference builds it from torchvision.models,
which is absent here; its conversion is pinned against a synthetic
torchvision-layout state_dict in tests/test_torch_weights.py.)
"""
from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF_LIB = "/root/reference/lib"


def _import_ref(module):
    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    stub("torch._six", string_classes=str, int_classes=int)
    stub("pynvml", nvmlInit=lambda: None)
    stub("torchsummary", summary=lambda *a, **k: None)
    tv = types.ModuleType("torchvision")
    tv.models = types.ModuleType("torchvision.models")
    tr = types.ModuleType("torchvision.transforms")
    tr.__path__ = []  # mark as package for the .functional import
    trf = types.ModuleType("torchvision.transforms.functional")
    tr.functional = trf
    tv.transforms = tr
    stubs["torchvision"] = tv
    stubs["torchvision.models"] = tv.models
    stubs["torchvision.transforms"] = tr
    stubs["torchvision.transforms.functional"] = trf
    stub("pycocotools")
    stub("pycocotools.mask")

    had = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_LIB)
    try:
        mod = importlib.import_module(module)
        cfg_mod = importlib.import_module("core.config")
    finally:
        sys.path.remove(REF_LIB)
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod, cfg_mod


def test_vgg16_dilated_forward_parity(rng):
    """dilated_conv5_body (vgg16.py:34-132): conv5 dilation 2, no pool4/5,
    stride 8 — weights copied conv-by-conv into the flax DilatedVGG16."""
    mod, cfg_mod = _import_ref("modeling.vgg16")
    rcfg = cfg_mod.cfg
    rcfg.immutable(False)
    rcfg.VGG.FREEZE_AT = 2
    body = mod.dilated_conv5_body()
    body.eval()
    sd = body.state_dict()

    # remap the module's conv{g}.{idx} names to the torchvision
    # features.{N} layout convert_vgg16 understands (ordered zip)
    from cim_tpu.utils.torch_weights import _VGG_FEATURE_IDX, convert_vgg16

    ref_keys = [
        f"conv{g}.{i}" for g, idxs in
        [(1, (0, 2)), (2, (0, 2)), (3, (0, 2, 4)), (4, (0, 2, 4)),
         (5, (0, 2, 4))]
        for i in idxs
    ]
    sd2 = {}
    for ref_k, (name, fidx) in zip(ref_keys, _VGG_FEATURE_IDX.items()):
        sd2[f"features.{fidx}.weight"] = sd[ref_k + ".weight"]
        sd2[f"features.{fidx}.bias"] = sd[ref_k + ".bias"]
    params = convert_vgg16(sd2)

    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = body(torch.from_numpy(x)).numpy()  # (1, 512, 8, 12)

    from cim_tpu.models.vgg import DilatedVGG16

    model = DilatedVGG16()
    got = model.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
        rtol=1e-4, atol=1e-4,
    )


SMALL_W48 = {
    "STAGE1": {"NUM_MODULES": 1, "NUM_BRANCHES": 1, "BLOCK": "BOTTLENECK",
               "NUM_BLOCKS": [4], "NUM_CHANNELS": [64]},
    "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
               "NUM_BLOCKS": [1, 1], "NUM_CHANNELS": [48, 96]},
    "STAGE3": {"NUM_MODULES": 1, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
               "NUM_BLOCKS": [1, 1, 1], "NUM_CHANNELS": [48, 96, 192]},
    "STAGE4": {"NUM_MODULES": 1, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
               "NUM_BLOCKS": [1, 1, 1, 1], "NUM_CHANNELS": [48, 96, 192, 384]},
}


@pytest.mark.slow
def test_hrnet_forward_parity(rng):
    """HighResolutionNet (HRNet.py:257-576) with W48 channel widths at
    reduced depth: real torch forward vs flax with converted weights —
    multi-resolution fusion, transition layers, and the
    incre/downsamp/final classification head all pinned."""
    mod, cfg_mod = _import_ref("modeling.HRNet")
    rcfg = cfg_mod.cfg
    rcfg.immutable(False)
    rcfg.HRNET.FREEZE_AT = 2
    for s, d in SMALL_W48.items():
        for k, v in d.items():
            rcfg.MODEL.EXTRA[s][k] = v
        rcfg.MODEL.EXTRA[s]["FUSE_METHOD"] = "SUM"
    net = mod.get_HRNet()
    net.eval()
    sd = net.state_dict()

    from cim_tpu.models.hrnet import HRNetW48
    from cim_tpu.utils.torch_weights import convert_hrnet_w48

    variables = convert_hrnet_w48(sd, stages=SMALL_W48)

    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()  # (1, 2048, 2, 2)

    model = HRNetW48(stages=SMALL_W48)
    got = model.apply(
        {"params": variables["params"], "stats": variables["stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
        rtol=1e-3, atol=1e-3,
    )
