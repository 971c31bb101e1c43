"""HRNet weight converter: a synthetic state_dict enumerating the official
torch HRNetV2-W48 naming/shapes must convert into exactly the flax tree of
cim_tpu.models.hrnet.HRNetW48."""
import numpy as np
import jax
import jax.numpy as jnp

from cim_tpu.models.hrnet import HRNetW48
from cim_tpu.utils.torch_weights import convert_hrnet_w48

C = [48, 96, 192, 384]  # W48 branch widths


class FakeTensor:
    def __init__(self, shape, rng):
        self.arr = rng.randn(*shape).astype(np.float32)

    def detach(self):
        return self

    def cpu(self):
        return self

    def numpy(self):
        return self.arr


def _w48_state_dict(rng):
    sd = {}

    def conv(name, cout, cin, k, bias=False):
        sd[name + ".weight"] = FakeTensor((cout, cin, k, k), rng)
        if bias:
            sd[name + ".bias"] = FakeTensor((cout,), rng)

    def bn(name, c):
        for sfx in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{sfx}"] = FakeTensor((c,), rng)

    def bottleneck(prefix, cin, mid, downsample):
        conv(f"{prefix}.conv1", mid, cin, 1)
        bn(f"{prefix}.bn1", mid)
        conv(f"{prefix}.conv2", mid, mid, 3)
        bn(f"{prefix}.bn2", mid)
        conv(f"{prefix}.conv3", mid * 4, mid, 1)
        bn(f"{prefix}.bn3", mid * 4)
        if downsample:
            conv(f"{prefix}.downsample.0", mid * 4, cin, 1)
            bn(f"{prefix}.downsample.1", mid * 4)

    def basic(prefix, cin, mid, downsample):
        conv(f"{prefix}.conv1", mid, cin, 3)
        bn(f"{prefix}.bn1", mid)
        conv(f"{prefix}.conv2", mid, mid, 3)
        bn(f"{prefix}.bn2", mid)
        if downsample:
            conv(f"{prefix}.downsample.0", mid, cin, 1)
            bn(f"{prefix}.downsample.1", mid)

    conv("conv1", 64, 3, 3)
    bn("bn1", 64)
    conv("conv2", 64, 64, 3)
    bn("bn2", 64)
    for b in range(4):
        bottleneck(f"layer1.{b}", 256 if b else 64, 64, b == 0)

    stages = {2: (1, 2, [4, 4]), 3: (4, 3, [4, 4, 4]), 4: (3, 4, [4, 4, 4, 4])}
    pre = [256]
    for s, (mods, branches, blocks) in stages.items():
        cur = C[:branches]
        t = f"transition{s - 1}"
        for i in range(branches):
            if i < len(pre):
                if cur[i] != pre[i]:
                    conv(f"{t}.{i}.0", cur[i], pre[i], 3)
                    bn(f"{t}.{i}.1", cur[i])
            else:
                for j in range(i + 1 - len(pre)):
                    out_c = cur[i] if j == i - len(pre) else pre[-1]
                    conv(f"{t}.{i}.{j}.0", out_c, pre[-1], 3)
                    bn(f"{t}.{i}.{j}.1", out_c)
        for m in range(mods):
            base = f"stage{s}.{m}"
            for i in range(branches):
                for b in range(blocks[i]):
                    basic(f"{base}.branches.{i}.{b}", cur[i], cur[i], False)
            for i in range(branches):
                for j in range(branches):
                    if j == i:
                        continue
                    if j > i:
                        conv(f"{base}.fuse_layers.{i}.{j}.0", cur[i], cur[j], 1)
                        bn(f"{base}.fuse_layers.{i}.{j}.1", cur[i])
                    else:
                        for k in range(i - j):
                            out_c = cur[i] if k == i - j - 1 else cur[j]
                            conv(f"{base}.fuse_layers.{i}.{j}.{k}.0", out_c,
                                 cur[j] if k == 0 else cur[j], 3)
                            bn(f"{base}.fuse_layers.{i}.{j}.{k}.1", out_c)
        pre = cur

    head_ch = [32, 64, 128, 256]
    for i in range(4):
        bottleneck(f"incre_modules.{i}.0", C[i], head_ch[i], True)
    for i in range(3):
        conv(f"downsamp_modules.{i}.0", head_ch[i + 1] * 4, head_ch[i] * 4, 3,
             bias=True)
        bn(f"downsamp_modules.{i}.1", head_ch[i + 1] * 4)
    conv("final_layer.0", 2048, 1024, 1, bias=True)
    bn("final_layer.1", 2048)
    return sd


def _assert_same(a, b):
    assert tuple(a.shape) == tuple(np.asarray(b).shape), (
        a.shape, np.asarray(b).shape,
    )


def test_hrnet_w48_converter_matches_flax_tree(rng):
    sd = _w48_state_dict(rng)
    out = convert_hrnet_w48(sd)

    model = HRNetW48()
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    jax.tree.map(_assert_same, ref["params"], out["params"])
    jax.tree.map(_assert_same, ref["stats"], out["stats"])

    # spot check: stage4 module-2 fuse 3<-0 chain conv
    got = out["params"]["stage4_m2"]["fuse3_0_2_conv"]["conv"]["kernel"]
    want = sd["stage4.2.fuse_layers.3.0.2.0.weight"].arr.transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(got), want)
