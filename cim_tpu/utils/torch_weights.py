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
    else:
        raise NotImplementedError(conv_body)

    params = {
        "conv_body": body_params,
        "box_head": convert_mask_fuse(sd),
        "cls_iou": convert_cls_iou_heads(sd, refine_times),
    }
    stats = {"conv_body": body_stats} if body_stats else {}
    return {"params": params, "stats": stats}
