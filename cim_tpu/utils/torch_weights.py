"""Torch-checkpoint -> flax-variable converters.

Replaces the reference's weight loaders (lib/utils/{vgg,hrnet,resnet,
detectron}_weights_helper.py + torchvision pretrained load at
lib/modeling/resnet50.py:20): given a torch ``state_dict`` (loaded with
``torch.load(..., map_location='cpu')``), produce flax params/stats trees
for the matching cim_tpu module.

Layout conventions:
- conv weights OIHW -> HWIO;
- linear weights (out, in) -> (in, out);
- BatchNorm (weight, bias, running_mean, running_var) ->
  FrozenBatchNorm params (scale, bias) + stats (mean, var).
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def conv_w(x):
    return _t(x).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def linear_w(x):
    return _t(x).T


def _bn(sd, prefix):
    params = {
        "scale": _t(sd[prefix + ".weight"]),
        "bias": _t(sd[prefix + ".bias"]),
    }
    stats = {
        "mean": _t(sd[prefix + ".running_mean"]),
        "var": _t(sd[prefix + ".running_var"]),
    }
    return params, stats


def convert_torchvision_resnet50(sd) -> Tuple[Dict, Dict]:
    """torchvision resnet50 state_dict -> (params, stats) for ResNet50C4
    (conv1..layer3; reference resnet50.py:26-33 res1..res4 naming)."""
    params: Dict = {}
    stats: Dict = {}

    params["res1_conv"] = {"conv": {"kernel": conv_w(sd["conv1.weight"])}}
    p, s = _bn(sd, "bn1")
    params["res1_bn"] = p
    stats["res1_bn"] = s

    blocks = {"res2": ("layer1", 3), "res3": ("layer2", 4), "res4": ("layer3", 6)}
    for stage, (layer, n) in blocks.items():
        sp: Dict = {}
        ss: Dict = {}
        for b in range(n):
            bp: Dict = {}
            bs: Dict = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"] = {
                    "conv": {"kernel": conv_w(sd[f"{layer}.{b}.conv{i}.weight"])}
                }
                p, s = _bn(sd, f"{layer}.{b}.bn{i}")
                bp[f"bn{i}"] = p
                bs[f"bn{i}"] = s
            if b == 0:
                bp["downsample_conv"] = {
                    "conv": {
                        "kernel": conv_w(sd[f"{layer}.0.downsample.0.weight"])
                    }
                }
                p, s = _bn(sd, f"{layer}.0.downsample.1")
                bp["downsample_bn"] = p
                bs["downsample_bn"] = s
            sp[f"block{b}"] = bp
            ss[f"block{b}"] = bs
        params[stage] = sp
        stats[stage] = ss
    return params, stats


# caffe vgg16 state_dict keys are features.N.{weight,bias}; the reference's
# regex mapping (lib/utils/vgg_weights_helper.py:14-57) pairs them with its
# conv{g}.{i} modules. Group layout of features indices:
_VGG_FEATURE_IDX = {
    "conv1_0": 0, "conv1_1": 2,
    "conv2_0": 5, "conv2_1": 7,
    "conv3_0": 10, "conv3_1": 12, "conv3_2": 14,
    "conv4_0": 17, "conv4_1": 19, "conv4_2": 21,
    "conv5_0": 24, "conv5_1": 26, "conv5_2": 28,
}


def convert_vgg16(sd) -> Dict:
    """torchvision/caffe vgg16 `features.*` weights -> DilatedVGG16 params."""
    # accept either 'features.N.weight' or bare 'conv1_1.weight' style keys
    params: Dict = {}
    for name, fidx in _VGG_FEATURE_IDX.items():
        wkey = f"features.{fidx}.weight"
        bkey = f"features.{fidx}.bias"
        if wkey not in sd:
            # caffe-converted naming like conv1_1 / conv1_2
            g = int(name[4])
            j = int(name[6]) + 1
            wkey = f"conv{g}_{j}.weight"
            bkey = f"conv{g}_{j}.bias"
        params[name] = {
            "conv": {"kernel": conv_w(sd[wkey]), "bias": _t(sd[bkey])}
        }
    return params


def convert_mask_fuse(sd, prefix="Box_Head.") -> Dict:
    """Reference MaskFuse weights (mask_branch.0 conv; seg_fc.0/.2 FCs)."""
    return {
        "mask_branch": {
            "conv": {
                "kernel": conv_w(sd[prefix + "mask_branch.0.weight"]),
                "bias": _t(sd[prefix + "mask_branch.0.bias"]),
            }
        },
        "seg_fc1": {
            "dense": {
                "kernel": linear_w(sd[prefix + "seg_fc.0.weight"]),
                "bias": _t(sd[prefix + "seg_fc.0.bias"]),
            }
        },
        "seg_fc2": {
            "dense": {
                "kernel": linear_w(sd[prefix + "seg_fc.2.weight"]),
                "bias": _t(sd[prefix + "seg_fc.2.bias"]),
            }
        },
    }


def convert_cls_iou_heads(sd, refine_times=3, prefix="cls_iou_model.") -> Dict:
    """Reference cls_iou_model weights -> ClsIouHead params."""
    out: Dict = {}
    for name in ("classifier", "detector"):
        out[name] = {
            "dense": {
                "kernel": linear_w(sd[prefix + name + ".weight"]),
                "bias": _t(sd[prefix + name + ".bias"]),
            }
        }
    for k in range(refine_times):
        out[f"refine_cls{k}"] = {
            "dense": {
                "kernel": linear_w(sd[f"{prefix}refine_cls.{k}.weight"]),
                "bias": _t(sd[f"{prefix}refine_cls.{k}.bias"]),
            }
        }
        out[f"refine_iou{k}"] = {
            "dense": {
                "kernel": linear_w(sd[f"{prefix}refine_iou.{k}.weight"]),
                "bias": _t(sd[f"{prefix}refine_iou.{k}.bias"]),
            }
        }
    return out


def _hr_convbn(sd, conv_key, bn_key, name):
    """(params, stats) for a TorchConv+FrozenBatchNorm pair named
    f'{name}_conv' / f'{name}_bn' in cim_tpu.models.hrnet."""
    params = {f"{name}_conv": {"conv": {"kernel": conv_w(sd[conv_key + ".weight"])}}}
    if conv_key + ".bias" in sd:
        params[f"{name}_conv"]["conv"]["bias"] = _t(sd[conv_key + ".bias"])
    p, s = _bn(sd, bn_key)
    return params, {f"{name}_bn": p}, {f"{name}_bn": s}


def _hr_block(sd, prefix, kind):
    """One BasicBlock/Bottleneck: torch conv1/bn1[... conv3/bn3]
    [downsample.0/1] -> hrnet.py c1/c2[/c3][/ds] naming."""
    params: Dict = {}
    stats: Dict = {}
    n_convs = 3 if kind == "BOTTLENECK" else 2
    for i in range(1, n_convs + 1):
        p, bp, bs = _hr_convbn(sd, f"{prefix}.conv{i}", f"{prefix}.bn{i}", f"c{i}")
        params.update(p)
        params.update(bp)
        stats.update(bs)
    if f"{prefix}.downsample.0.weight" in sd:
        p, bp, bs = _hr_convbn(
            sd, f"{prefix}.downsample.0", f"{prefix}.downsample.1", "ds"
        )
        params.update(p)
        params.update(bp)
        stats.update(bs)
    return params, stats


def convert_hrnet_w48(sd, stages=None):
    """HRNetV2-W48 imagenet checkpoint -> flax variables for HRNetW48
    (reference lib/utils/hrnet_weights_helper.py:15-39 loads by state-dict
    intersection; here an explicit name map). Returns {'params','stats'}."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    stages = stages or {
        "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [4, 4]},
        "STAGE3": {"NUM_MODULES": 4, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [4, 4, 4]},
        "STAGE4": {"NUM_MODULES": 3, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [4, 4, 4, 4]},
    }
    params: Dict = {}
    stats: Dict = {}

    def put(pp, ss):
        params.update(pp)
        stats.update(ss)

    # stem
    p, bp, bs = _hr_convbn(sd, "conv1", "bn1", "stem1")
    put({**p, **bp}, bs)
    p, bp, bs = _hr_convbn(sd, "conv2", "bn2", "stem2")
    put({**p, **bp}, bs)
    # layer1 (4 bottlenecks)
    for b in range(4):
        pp, ss = _hr_block(sd, f"layer1.{b}", "BOTTLENECK")
        params[f"layer1_b{b}"] = pp
        stats[f"layer1_b{b}"] = ss

    # transitions + stages
    for s_i in (2, 3, 4):
        sc = stages[f"STAGE{s_i}"]
        t = f"transition{s_i - 1}"
        for i in range(sc["NUM_BRANCHES"]):
            if f"{t}.{i}.0.weight" in sd:
                # same-resolution 3x3 conv branch
                p, bp, bs = _hr_convbn(
                    sd, f"{t}.{i}.0", f"{t}.{i}.1", f"trans{s_i}_{i}"
                )
                put({**p, **bp}, bs)
            else:
                # chain of stride-2 convs: {t}.{i}.{j}.0/.1
                j = 0
                while f"{t}.{i}.{j}.0.weight" in sd:
                    p, bp, bs = _hr_convbn(
                        sd, f"{t}.{i}.{j}.0", f"{t}.{i}.{j}.1",
                        f"trans{s_i}_{i}_{j}",
                    )
                    put({**p, **bp}, bs)
                    j += 1
        for m in range(sc["NUM_MODULES"]):
            mod_p: Dict = {}
            mod_s: Dict = {}
            base = f"stage{s_i}.{m}"
            for i in range(sc["NUM_BRANCHES"]):
                for b in range(sc["NUM_BLOCKS"][i]):
                    pp, ss = _hr_block(
                        sd, f"{base}.branches.{i}.{b}", sc["BLOCK"]
                    )
                    mod_p[f"branch{i}_block{b}"] = pp
                    mod_s[f"branch{i}_block{b}"] = ss
            # fuse layers: torch fuse_layers.i.j is Sequential(conv, bn[, up])
            # for j > i, or a list of stride-2 conv+bn(+relu) for j < i
            for i in range(sc["NUM_BRANCHES"]):
                for j in range(sc["NUM_BRANCHES"]):
                    if j == i:
                        continue
                    if j > i:
                        key = f"{base}.fuse_layers.{i}.{j}"
                        if f"{key}.0.weight" not in sd:
                            continue
                        p, bp, bs = _hr_convbn(
                            sd, f"{key}.0", f"{key}.1", f"fuse{i}_{j}"
                        )
                        flat_p = {**p, **bp}
                        mod_p.update(flat_p)
                        mod_s.update(bs)
                    else:
                        for k in range(i - j):
                            key = f"{base}.fuse_layers.{i}.{j}.{k}"
                            if f"{key}.0.weight" not in sd:
                                continue
                            p, bp, bs = _hr_convbn(
                                sd, f"{key}.0", f"{key}.1", f"fuse{i}_{j}_{k}"
                            )
                            mod_p.update({**p, **bp})
                            mod_s.update(bs)
            params[f"stage{s_i}_m{m}"] = mod_p
            stats[f"stage{s_i}_m{m}"] = mod_s

    # classification head
    for i in range(4):
        pp, ss = _hr_block(sd, f"incre_modules.{i}.0", "BOTTLENECK")
        params[f"incre{i}"] = pp
        stats[f"incre{i}"] = ss
    for i in range(3):
        p, bp, bs = _hr_convbn(
            sd, f"downsamp_modules.{i}.0", f"downsamp_modules.{i}.1",
            f"downsamp{i}",
        )
        put({**p, **bp}, bs)
    p, bp, bs = _hr_convbn(sd, "final_layer.0", "final_layer.1", "final")
    put({**p, **bp}, bs)
    return {"params": params, "stats": stats}


def convert_prm_checkpoint(sd, num_classes=20):
    """fc_resnet50 PRM checkpoint -> FCResNet50 flax variables.

    Reference naming (lib/prm/prm_model.py:279-301): features.0 conv1,
    features.1 bn1, features.4..7 layer1..4, classifier.0 the 1x1 conv."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    remap = {}
    for k, v in sd.items():
        k2 = k
        k2 = re.sub(r"^features\.0\.", "conv1.", k2)
        k2 = re.sub(r"^features\.1\.", "bn1.", k2)
        k2 = re.sub(r"^features\.4\.", "layer1.", k2)
        k2 = re.sub(r"^features\.5\.", "layer2.", k2)
        k2 = re.sub(r"^features\.6\.", "layer3.", k2)
        k2 = re.sub(r"^features\.7\.", "layer4.", k2)
        remap[k2] = v

    params: Dict = {}
    stats: Dict = {}
    params["res1_conv"] = {"kernel": conv_w(remap["conv1.weight"])}
    p, s = _bn(remap, "bn1")
    params["res1_bn"] = p
    stats["res1_bn"] = s
    blocks = {
        "res2": ("layer1", 3), "res3": ("layer2", 4),
        "res4": ("layer3", 6), "res5": ("layer4", 3),
    }
    for stage, (layer, n) in blocks.items():
        for b in range(n):
            bp: Dict = {}
            bs: Dict = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"] = {
                    "kernel": conv_w(remap[f"{layer}.{b}.conv{i}.weight"])
                }
                pi, si = _bn(remap, f"{layer}.{b}.bn{i}")
                bp[f"bn{i}"] = pi
                bs[f"bn{i}"] = si
            if b == 0:
                bp["downsample_conv"] = {
                    "kernel": conv_w(remap[f"{layer}.0.downsample.0.weight"])
                }
                pi, si = _bn(remap, f"{layer}.0.downsample.1")
                bp["downsample_bn"] = pi
                bs["downsample_bn"] = si
            params[f"{stage}_block{b}"] = bp
            stats[f"{stage}_block{b}"] = bs
    params["classifier"] = {
        "kernel": conv_w(remap["classifier.0.weight"]),
        "bias": _t(remap["classifier.0.bias"]),
    }
    return {"params": params, "stats": stats}


def body_for_config(conv_body_name: str) -> str:
    """cfg.MODEL.CONV_BODY -> converter family for the checkpoint
    loaders ('vgg16' | 'hrnet48' | 'resnet50')."""
    name = conv_body_name.lower()
    if name.startswith("vgg"):
        return "vgg16"
    if "hrnet" in name:
        return "hrnet48"
    return "resnet50"


def load_detectron_pkl(path_or_blobs, conv_body="resnet50", refine_times=3):
    """Detectron-pkl checkpoint -> CIMModel variables.

    Reference contract: lib/utils/detectron_weight_helper.py:9-21 loads a
    pickle ({'blobs': {name: ndarray}} or a bare dict) and copies blobs
    into the torch state dict through ``detectron_weight_mapping`` — which
    every CIM module defines as the IDENTITY map (resnet50.py:79-85,
    MaskFuse :112-118, heads :185-191), so blobs are keyed by the torch
    parameter names. Accepted by ref tools/train.py:338-340
    (--load_detectron)."""
    if isinstance(path_or_blobs, (str, bytes)) or hasattr(
        path_or_blobs, "__fspath__"
    ):
        import pickle

        with open(path_or_blobs, "rb") as f:
            blobs = pickle.load(f, encoding="latin1")
    else:
        blobs = path_or_blobs
    if "blobs" in blobs:
        blobs = blobs["blobs"]
    return convert_reference_checkpoint(blobs, conv_body, refine_times)


def convert_reference_checkpoint(sd, conv_body="resnet50", refine_times=3):
    """Full reference CIM checkpoint (model key of model_step*.pth) ->
    {'params': ..., 'stats': ...} for CIMModel.

    Reference checkpoints prefix modules Conv_Body. / Box_Head. /
    cls_iou_model. (model_builder.py:82-87)."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    body_sd = {
        k[len("Conv_Body.") :]: v
        for k, v in sd.items()
        if k.startswith("Conv_Body.")
    }
    if conv_body.startswith("resnet50"):
        # reference wraps torchvision modules as res1.0 (conv1), res1.1
        # (bn1), res2..res4 = layer1..layer3
        remap = {}
        for k, v in body_sd.items():
            k2 = k
            k2 = re.sub(r"^res1\.0\.", "conv1.", k2)
            k2 = re.sub(r"^res1\.1\.", "bn1.", k2)
            k2 = re.sub(r"^res2\.", "layer1.", k2)
            k2 = re.sub(r"^res3\.", "layer2.", k2)
            k2 = re.sub(r"^res4\.", "layer3.", k2)
            remap[k2] = v
        body_params, body_stats = convert_torchvision_resnet50(remap)
    elif conv_body.startswith("vgg16"):
        body_params = convert_vgg16(body_sd)
        body_stats = {}
    elif "hrnet" in conv_body:
        hr = convert_hrnet_w48(body_sd)
        body_params, body_stats = hr["params"], hr["stats"]
    else:
        raise NotImplementedError(conv_body)

    params = {
        "conv_body": body_params,
        "box_head": convert_mask_fuse(sd),
        "cls_iou": convert_cls_iou_heads(sd, refine_times),
    }
    stats = {"conv_body": body_stats} if body_stats else {}
    return {"params": params, "stats": stats}
