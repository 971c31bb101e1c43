"""Weight-converter roundtrip: build a torch-style state_dict with the
reference's key naming and random values, convert, and check the flax
tree slots every tensor in the right place with the right transpose."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cim_tpu.utils import torch_weights as tw


def _assert_same_shape(a, b):
    assert tuple(a.shape) == tuple(np.asarray(b).shape), (a.shape, np.asarray(b).shape)


class FakeTensor:
    def __init__(self, arr):
        self.arr = np.asarray(arr, np.float32)

    def detach(self):
        return self

    def cpu(self):
        return self

    def numpy(self):
        return self.arr


def _resnet50_state_dict(rng):
    sd = {}

    def add_conv(name, cout, cin, k):
        sd[name + ".weight"] = FakeTensor(rng.randn(cout, cin, k, k))

    def add_bn(name, c):
        for suffix, v in (
            ("weight", rng.randn(c)),
            ("bias", rng.randn(c)),
            ("running_mean", rng.randn(c)),
            ("running_var", rng.rand(c) + 0.5),
        ):
            sd[f"{name}.{suffix}"] = FakeTensor(v)

    add_conv("conv1", 64, 3, 7)
    add_bn("bn1", 64)
    specs = {"layer1": (64, 256, 3), "layer2": (128, 512, 4), "layer3": (256, 1024, 6)}
    cin_prev = 64
    for layer, (mid, cout, n) in specs.items():
        for b in range(n):
            cin = cin_prev if b == 0 else cout
            add_conv(f"{layer}.{b}.conv1", mid, cin, 1)
            add_bn(f"{layer}.{b}.bn1", mid)
            add_conv(f"{layer}.{b}.conv2", mid, mid, 3)
            add_bn(f"{layer}.{b}.bn2", mid)
            add_conv(f"{layer}.{b}.conv3", cout, mid, 1)
            add_bn(f"{layer}.{b}.bn3", cout)
        add_conv(f"{layer}.0.downsample.0", cout, cin_prev, 1)
        add_bn(f"{layer}.0.downsample.1", cout)
        cin_prev = cout
    return sd


def test_resnet50_conversion_matches_flax_tree(rng):
    from cim_tpu.models.resnet import ResNet50C4

    sd = _resnet50_state_dict(rng)
    params, stats = tw.convert_torchvision_resnet50(sd)

    model = ResNet50C4()
    x = jnp.zeros((1, 32, 32, 3))
    ref = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))

    # converted tree must exactly match the flax init tree structure+shapes
    # (tree.map over both trees raises on structure mismatch)
    jax.tree.map(_assert_same_shape, ref["params"], params)
    jax.tree.map(_assert_same_shape, ref["stats"], stats)

    # spot-check a transpose: conv1 OIHW (64,3,7,7) -> HWIO (7,7,3,64)
    np.testing.assert_allclose(
        params["res1_conv"]["conv"]["kernel"],
        sd["conv1.weight"].arr.transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        stats["res3"]["block0"]["bn2"]["var"],
        sd["layer2.0.bn2.running_var"].arr,
    )


def test_heads_conversion_roundtrip(rng):
    sd = {}
    for name in ("classifier", "detector"):
        sd[f"cls_iou_model.{name}.weight"] = FakeTensor(rng.randn(21, 4096))
        sd[f"cls_iou_model.{name}.bias"] = FakeTensor(rng.randn(21))
    for k in range(3):
        for br in ("refine_cls", "refine_iou"):
            sd[f"cls_iou_model.{br}.{k}.weight"] = FakeTensor(rng.randn(21, 4096))
            sd[f"cls_iou_model.{br}.{k}.bias"] = FakeTensor(rng.randn(21))
    out = tw.convert_cls_iou_heads(sd)
    assert out["classifier"]["dense"]["kernel"].shape == (4096, 21)
    np.testing.assert_allclose(
        out["refine_iou2"]["dense"]["kernel"],
        sd["cls_iou_model.refine_iou.2.weight"].arr.T,
    )


def test_vgg_conversion_keys(rng):
    sd = {}
    for name, fidx in tw._VGG_FEATURE_IDX.items():
        cout = {1: 64, 2: 128, 3: 256, 4: 512, 5: 512}[int(name[4])]
        cin = 3 if name == "conv1_0" else cout if name[6] != "0" else {
            "conv2_0": 64, "conv3_0": 128, "conv4_0": 256, "conv5_0": 512
        }.get(name, cout)
        sd[f"features.{fidx}.weight"] = FakeTensor(rng.randn(cout, cin, 3, 3))
        sd[f"features.{fidx}.bias"] = FakeTensor(rng.randn(cout))
    params = tw.convert_vgg16(sd)
    from cim_tpu.models.vgg import DilatedVGG16

    model = DilatedVGG16()
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    )
    jax.tree.map(_assert_same_shape, ref["params"], params)


def test_load_detectron_pkl_roundtrip(rng, tmp_path):
    """Detectron-pkl path (reference detectron_weight_helper.py:9-21 with
    the identity detectron_weight_mapping): a {'blobs': {torch-name:
    ndarray}} pickle loads into the same tree as the torch state_dict
    converter."""
    import pickle

    from tests.oracle_model import TorchCIMOracle

    import torch

    torch.manual_seed(1)
    oracle = TorchCIMOracle(num_classes=20, refine_times=3)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    pkl = tmp_path / "detectron.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"blobs": sd}, f)

    got = tw.load_detectron_pkl(str(pkl), conv_body="resnet50", refine_times=3)
    want = tw.convert_reference_checkpoint(sd, "resnet50", refine_times=3)
    jax.tree.map(np.testing.assert_array_equal, got, want)
    # spot-check a transpose actually happened (OIHW -> HWIO)
    k = got["params"]["conv_body"]["res1_conv"]["conv"]["kernel"]
    assert k.shape == (7, 7, 3, 64)
