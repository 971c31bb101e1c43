"""Full-model parity vs the *executed* reference Generalized_RCNN.

tests/test_reference_exec_parity.py executes the reference's mining and
loss functions (heads.py) directly; tests/test_full_pipeline_parity.py
pins the assembled chain against a builder-written transliteration
(tests/oracle_model.py). This module closes the remaining gap between
the two: it imports and runs the reference's OWN model assembly —
lib/modeling/model_builder.py:Generalized_RCNN — in both eval and
training mode, so the branch wiring, squeeze/dtype handling, CIM_layer
threshold ramp (0.25/0.5 + step_rate*k, model_builder.py:89-94), the
iou-pkl read path (:147-159) and the loss accumulation with lambda=3 on
branch 0 and the 3x iou weight (:161-207) are all pinned by reference
execution rather than transliteration.

The conv body is the reference's real dilated VGG16 (vgg16.py:34-132,
proven importable by tests/test_reference_exec_backbones.py) with its
MaskFuse box head (vgg16.py:135-179); weights are randomly initialized
by torch and converted to the flax side with utils.torch_weights, so
both stacks compute from identical parameters.

Import shims (behavior-preserving, none touch the math):
  - ``mmcv.ops`` is absent here; lib/ops/__init__.py:6 re-exports its
    RoIAlign/RoIPool. The shim below is an independent numpy
    transliteration of mmcv's roi_align CUDA kernel (aligned=True,
    adaptive sampling_ratio=0) — the same spec cim_tpu/ops/roi_align.py
    implements in XLA, but written against the CUDA source, not against
    our op.
  - ``torchvision.ops``: heads.py imports box_iou/nms; with iou_map
    provided (always, here and in every shipped config) neither is
    reached — stubs raise if touched.
  - ``torch.Tensor.cuda`` is patched to identity during the training
    forward only (PCL_loss opens with ``torch.tensor(0.).cuda(...)``,
    heads.py:11; the value 0.0 is what enters the math).
"""
from __future__ import annotations

import contextlib
import importlib
import math
import os
import pickle
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cim_tpu.config import clone_cfg, get_default_cfg
from cim_tpu.data.synthetic import make_microbatch
from cim_tpu.engine.train import compute_losses
from cim_tpu.models.builder import build_model
from cim_tpu.utils.torch_weights import (
    _VGG_FEATURE_IDX,
    convert_cls_iou_heads,
    convert_mask_fuse,
    convert_vgg16,
)

REF_LIB = "/root/reference/lib"

N_VALID = 24
N_PAD = 32
IMAGE_HW = (96, 128)  # stride 8 -> 12x16 feature map


# --------------------------------------------------------------------- #
# mmcv.ops RoIAlign shim: numpy transliteration of the CUDA kernel
# (mmcv/ops/csrc/common/cuda/roi_align_cuda_kernel.cuh, aligned=True)
# --------------------------------------------------------------------- #
def _bilinear(feat, y, x):
    """CUDA bilinear_interpolate border semantics; feat (C, H, W)."""
    C, H, W = feat.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(C, feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(math.floor(y))
    x_low = int(math.floor(x))
    if y_low >= H - 1:
        y_high = y_low = H - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= W - 1:
        x_high = x_low = W - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return (
        hy * hx * feat[:, y_low, x_low]
        + hy * lx * feat[:, y_low, x_high]
        + ly * hx * feat[:, y_high, x_low]
        + ly * lx * feat[:, y_high, x_high]
    )


def _mmcv_roi_align_np(feat, rois, out_size, spatial_scale, sampling_ratio):
    """feat (C, H, W); rois (N, 5) with batch index col 0; aligned=True."""
    C = feat.shape[0]
    n = rois.shape[0]
    out = np.zeros((n, C, out_size, out_size), feat.dtype)
    for r in range(n):
        x1 = rois[r, 1] * spatial_scale - 0.5
        y1 = rois[r, 2] * spatial_scale - 0.5
        x2 = rois[r, 3] * spatial_scale - 0.5
        y2 = rois[r, 4] * spatial_scale - 0.5
        roi_w = x2 - x1
        roi_h = y2 - y1
        bin_h = roi_h / out_size
        bin_w = roi_w / out_size
        grid_h = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_h / out_size))
        grid_w = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_w / out_size))
        count = max(grid_h * grid_w, 1)
        for ph in range(out_size):
            for pw in range(out_size):
                acc = np.zeros(C, feat.dtype)
                for iy in range(grid_h):
                    y = y1 + ph * bin_h + (iy + 0.5) * bin_h / grid_h
                    for ix in range(grid_w):
                        x = x1 + pw * bin_w + (ix + 0.5) * bin_w / grid_w
                        acc += _bilinear(feat, y, x)
                out[r, :, ph, pw] = acc / count
    return out


class _RoIAlignShim:
    def __init__(self, output_size, spatial_scale=1.0, sampling_ratio=0,
                 *args, **kwargs):
        self.output_size = output_size
        self.spatial_scale = float(spatial_scale)
        self.sampling_ratio = int(sampling_ratio)

    def __call__(self, feat, rois):
        got = _mmcv_roi_align_np(
            feat.detach().numpy()[0],
            rois.detach().numpy(),
            self.output_size,
            self.spatial_scale,
            self.sampling_ratio,
        )
        return torch.from_numpy(got)


def _never(*a, **k):  # pragma: no cover - must not be reached
    raise AssertionError("unexpected mmcv/torchvision op call")


@contextlib.contextmanager
def _np_float_alias():
    """core/test.py:453-454 uses the pre-1.24 ``np.float``/``np.int``
    builtin aliases (removed upstream in numpy); restore them for the
    call only — they were always exactly the builtins."""
    added = [n for n in ("float", "int") if not hasattr(np, n)]
    for n in added:
        setattr(np, n, {"float": float, "int": int}[n])
    try:
        yield
    finally:
        for n in added:
            delattr(np, n)


@contextlib.contextmanager
def _cpu_cuda():
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = orig


def _tv_resnet50(pretrained=False):
    """torchvision.models.resnet50 stand-in: the reference delegates its
    trunk entirely to torchvision (resnet50.py:20) and only slices it
    into res1..res4 Sequentials (:26-33). The stand-in reproduces the
    torchvision-v1.5 architecture + state_dict naming with the same
    Bottleneck the transliterated oracle uses (tests/oracle_model.py),
    so the *executed* reference code contributes the slicing, freezing,
    permanently-eval-BN and MaskFuse semantics."""
    import torch.nn as nn

    from tests.oracle_model import _stage

    assert not pretrained  # no zoo download in tests
    m = types.SimpleNamespace()
    m.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    m.bn1 = nn.BatchNorm2d(64)
    m.relu = nn.ReLU(inplace=True)
    m.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
    m.layer1 = _stage(64, 64, 3, 1)
    m.layer2 = _stage(256, 128, 4, 2)
    m.layer3 = _stage(512, 256, 6, 2)
    m.layer4 = _stage(1024, 512, 3, 2)
    return m


def _import_model_builder():
    """Import the reference modeling.model_builder with stub modules."""
    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    stub("torch._six", string_classes=str, int_classes=int)
    stub("pynvml", nvmlInit=lambda: None)
    stub("torchsummary", summary=lambda *a, **k: None)
    stub("pycocotools")
    stub("pycocotools.mask")
    # torchvision for vgg16.py/heads.py; .ops never reached with iou_map
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.box_iou = _never
    ops.nms = _never
    tv.ops = ops
    tv.models = types.ModuleType("torchvision.models")
    tv.models.resnet50 = _tv_resnet50
    tr = types.ModuleType("torchvision.transforms")
    tr.__path__ = []  # mark as package for the .functional import
    trf = types.ModuleType("torchvision.transforms.functional")
    tr.functional = trf
    tv.transforms = tr
    stubs["torchvision"] = tv
    stubs["torchvision.ops"] = ops
    stubs["torchvision.models"] = tv.models
    stubs["torchvision.transforms"] = tr
    stubs["torchvision.transforms.functional"] = trf
    # mmcv.ops for lib/ops/__init__.py
    mmcv = types.ModuleType("mmcv")
    mops = types.ModuleType("mmcv.ops")
    mops.RoIAlign = _RoIAlignShim
    mops.RoIPool = _never
    mops.roi_align = _never
    mops.roi_pool = _never
    mops.nms = _never
    mops.soft_nms = _never
    mmcv.ops = mops
    stubs["mmcv"] = mmcv
    stubs["mmcv.ops"] = mops

    had = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_LIB)
    try:
        mb = importlib.import_module("modeling.model_builder")
        cfg_mod = importlib.import_module("core.config")
        # pre-import what Generalized_RCNN.__init__ resolves lazily via
        # get_func (model_builder.py:16-34) — the stubs are gone by then
        importlib.import_module("modeling.vgg16")
        importlib.import_module("modeling.resnet50")
        importlib.import_module("modeling.HRNet")
    finally:
        sys.path.remove(REF_LIB)
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mb, cfg_mod


def _import_core_test():
    """Import the reference core/test.py (for im_detect_bbox_aug) with the
    same stub set tests/test_reference_exec_eval_post.py uses."""
    from cim_tpu.ops.boxes import box_iou
    from cim_tpu.ops.nms import nms_np, soft_nms_np

    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    class _ToTensor:
        def __call__(self, a):
            return torch.from_numpy(
                a.transpose(2, 0, 1).astype(np.float32) / 255.0
            )

    class _Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class _Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    stub("torch._six", string_classes=str, int_classes=int)
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.ToTensor, tr.Normalize, tr.Compose = _ToTensor, _Normalize, _Compose
    tv.transforms = tr
    ops = types.ModuleType("torchvision.ops")
    ops.box_iou = _never
    ops.nms = _never
    tv.ops = ops
    stubs["torchvision"] = tv
    stubs["torchvision.transforms"] = tr
    stubs["torchvision.ops"] = ops
    stub("pycocotools")
    stub("pycocotools.mask")
    stub(
        "utils.cython_nms",
        nms=lambda dets, thresh: np.asarray(nms_np(dets, thresh), np.int64),
        soft_nms=soft_nms_np,
    )
    stub(
        "utils.cython_bbox",
        bbox_overlaps=lambda b, q: np.asarray(
            box_iou(b.astype(np.float32), q.astype(np.float32),
                    legacy_plus_one=True)
        ),
    )

    had = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_LIB)
    try:
        mod = importlib.import_module("core.test")
    finally:
        sys.path.remove(REF_LIB)
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


class _UnwrapLists(torch.nn.Module):
    """Stands in for mynn.DataParallel(minibatch=True): core/test.py wraps
    every blob in a 1-element list (test.py:117-125) that DataParallel
    would scatter; unwrap and call the bare Generalized_RCNN."""

    def __init__(self, model):
        super().__init__()
        self.model = model

    def forward(self, **inputs):
        un = {
            k: (v[0] if isinstance(v, list) else v) for k, v in inputs.items()
        }
        return self.model(**un)


def _our_cfg(conv_body="vgg16.dilated_conv5_body"):
    cfg = clone_cfg(get_default_cfg())
    cfg.MODEL.CONV_BODY = conv_body
    cfg.MODEL.NUM_CLASSES = 20
    cfg.REFINE_TIMES = 3
    cfg.p_seed = 0.4
    cfg.step_rate = 0.05
    cfg.adj_thr = 0.85  # model_builder.py:89-94 leaves con_thr at its default
    cfg.Anti_noise_sampling = False
    cfg.TPU.PRECISION = "f32"
    cfg.TPU.PROPOSAL_PAD = N_PAD
    cfg.TPU.MAX_CLUSTERS = 8
    cfg.TPU.PALLAS_ROI_ALIGN = False
    cfg.TPU.REMAT_BOX_HEAD = False
    # image 96x128 at stride 8 -> feature extent <= 16 -> ceil(16/7) == 3
    cfg.TPU.MAX_ADAPTIVE_GRID = 3
    return cfg


@pytest.fixture(scope="module")
def ref_setup(tmp_path_factory):
    """Reference Generalized_RCNN + converted flax variables + fixtures."""
    mb, cfg_mod = _import_model_builder()
    rcfg = cfg_mod.cfg

    tmp = tmp_path_factory.mktemp("ioumaps")
    iou_dir = tmp / "iou"
    asy_dir = tmp / "asy"
    iou_dir.mkdir()
    asy_dir.mkdir()

    def apply_rcfg():
        # the reference cfg is a process GLOBAL the two fixtures share;
        # every test re-applies its fixture's settings first
        rcfg.immutable(False)
        rcfg.MODEL.NUM_CLASSES = 20
        rcfg.MODEL.CONV_BODY = "vgg16.dilated_conv5_body"
        rcfg.MODEL.LOAD_IMAGENET_PRETRAINED_WEIGHTS = False
        rcfg.FAST_RCNN.ROI_BOX_HEAD = "vgg16.MaskFuse"
        rcfg.FAST_RCNN.ROI_XFORM_METHOD = "RoIAlign"
        rcfg.FAST_RCNN.ROI_XFORM_RESOLUTION = 7
        rcfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO = 0
        rcfg.REFINE_TIMES = 3
        rcfg.p_seed = 0.4
        rcfg.step_rate = 0.05
        rcfg.Anti_noise_sampling = False
        rcfg.VGG_CLS_FEATURE = False
        rcfg.HRNET_CLS_FEATURE = False
        rcfg.TRAIN.FREEZE_CONV_BODY = False
        rcfg.VGG.FREEZE_AT = 2
        rcfg.iou_dir = str(iou_dir)
        rcfg.asy_iou_dir = str(asy_dir)

    apply_rcfg()

    torch.manual_seed(0)
    model = mb.Generalized_RCNN()

    # shared fixture batch (padded on the jax side)
    rng = np.random.RandomState(7)
    batch = make_microbatch(
        rng, image_hw=IMAGE_HW, n_props=N_PAD, n_valid=N_VALID,
        num_classes=20, n_labels=3, mask_grid=64,
    )
    name = "fixture_0001"
    with open(iou_dir / f"{name}.pkl", "wb") as f:
        pickle.dump(batch["iou_map"][:N_VALID, :N_VALID].astype(np.float32), f)
    with open(asy_dir / f"{name}.pkl", "wb") as f:
        pickle.dump(batch["asy_iou_map"][:N_VALID, :N_VALID].astype(np.float32), f)
    path = os.path.join("/nonexistent", name + ".jpg")

    variables = jax.tree.map(jnp.asarray, {"params": _convert_vgg_tree(model.state_dict())})
    return model, variables, batch, path, apply_rcfg


def _convert_vgg_tree(sd):
    """Reference state_dict (or an equally-shaped gradient dict) -> flax
    param tree; conv-body key remap as in tests/test_reference_exec_backbones."""
    ref_keys = [
        f"conv{g}.{i}" for g, idxs in
        [(1, (0, 2)), (2, (0, 2)), (3, (0, 2, 4)), (4, (0, 2, 4)),
         (5, (0, 2, 4))]
        for i in idxs
    ]
    sd2 = {}
    for ref_k, (pname, fidx) in zip(ref_keys, _VGG_FEATURE_IDX.items()):
        sd2[f"features.{fidx}.weight"] = sd[f"Conv_Body.{ref_k}.weight"]
        sd2[f"features.{fidx}.bias"] = sd[f"Conv_Body.{ref_k}.bias"]
    return {
        "conv_body": convert_vgg16(sd2),
        "box_head": convert_mask_fuse(sd),
        "cls_iou": convert_cls_iou_heads(sd, refine_times=3),
    }


@pytest.fixture(scope="module")
def ref_setup_resnet(tmp_path_factory):
    """The FLAGSHIP body: reference Generalized_RCNN with
    resnet50.torch_resnet50 + resnet50.MaskFuse (configs/resnet50_voc.yaml:3)
    — res1..res4 slicing, FREEZE_AT, permanently-eval BatchNorm
    (resnet50.py:53-77) — with randomized BN statistics so the
    running-stats conversion path is exercised for real."""
    mb, cfg_mod = _import_model_builder()
    rcfg = cfg_mod.cfg

    tmp = tmp_path_factory.mktemp("ioumaps_r50")
    iou_dir = tmp / "iou"
    asy_dir = tmp / "asy"
    iou_dir.mkdir()
    asy_dir.mkdir()

    def apply_rcfg():
        rcfg.immutable(False)
        rcfg.MODEL.NUM_CLASSES = 20
        rcfg.MODEL.CONV_BODY = "resnet50.torch_resnet50"
        rcfg.MODEL.LOAD_IMAGENET_PRETRAINED_WEIGHTS = False
        rcfg.FAST_RCNN.ROI_BOX_HEAD = "resnet50.MaskFuse"
        rcfg.FAST_RCNN.ROI_XFORM_METHOD = "RoIAlign"
        rcfg.FAST_RCNN.ROI_XFORM_RESOLUTION = 7
        rcfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO = 0
        rcfg.REFINE_TIMES = 3
        rcfg.p_seed = 0.4
        rcfg.step_rate = 0.05
        rcfg.Anti_noise_sampling = False
        rcfg.VGG_CLS_FEATURE = False
        rcfg.HRNET_CLS_FEATURE = False
        rcfg.TRAIN.FREEZE_CONV_BODY = False
        rcfg.ResNet.FREEZE_AT = 2
        rcfg.iou_dir = str(iou_dir)
        rcfg.asy_iou_dir = str(asy_dir)

    apply_rcfg()

    torch.manual_seed(1)
    model = mb.Generalized_RCNN()
    with torch.no_grad():  # non-trivial BN stats/affine for the converter
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0.0, 0.1)

    rng = np.random.RandomState(17)
    batch = make_microbatch(
        rng, image_hw=IMAGE_HW, n_props=N_PAD, n_valid=N_VALID,
        num_classes=20, n_labels=3, mask_grid=64,
    )
    name = "fixture_r50"
    with open(iou_dir / f"{name}.pkl", "wb") as f:
        pickle.dump(batch["iou_map"][:N_VALID, :N_VALID].astype(np.float32), f)
    with open(asy_dir / f"{name}.pkl", "wb") as f:
        pickle.dump(batch["asy_iou_map"][:N_VALID, :N_VALID].astype(np.float32), f)
    path = os.path.join("/nonexistent", name + ".jpg")

    from cim_tpu.utils.torch_weights import convert_reference_checkpoint

    variables = convert_reference_checkpoint(
        model.state_dict(), conv_body="resnet50", refine_times=3
    )
    variables = jax.tree.map(jnp.asarray, variables)
    return model, variables, batch, path, apply_rcfg


@pytest.fixture(scope="module")
def ref_setup_hrnet(tmp_path_factory):
    """Third body: reference Generalized_RCNN with HRNet.get_HRNet +
    HRNet.MaskFuse (configs/hrnet48_voc.yaml:3,78) — W48 multi-resolution
    trunk, pad-to-32, permanently-eval BN (HRNet.py:338-366), 2048-ch
    classification feature feeding the head (HRNET_CLS_FEATURE)."""
    import yaml

    mb, cfg_mod = _import_model_builder()
    rcfg = cfg_mod.cfg
    with open("/root/reference/configs/hrnet48_voc.yaml") as f:
        extra = yaml.safe_load(f)["MODEL"]["EXTRA"]

    tmp = tmp_path_factory.mktemp("ioumaps_hr")
    iou_dir = tmp / "iou"
    asy_dir = tmp / "asy"
    iou_dir.mkdir()
    asy_dir.mkdir()

    def apply_rcfg():
        rcfg.immutable(False)
        rcfg.MODEL.NUM_CLASSES = 20
        rcfg.MODEL.CONV_BODY = "HRNet.get_HRNet"
        rcfg.MODEL.LOAD_IMAGENET_PRETRAINED_WEIGHTS = False
        rcfg.MODEL.EXTRA = extra
        rcfg.FAST_RCNN.ROI_BOX_HEAD = "HRNet.MaskFuse"
        rcfg.FAST_RCNN.ROI_XFORM_METHOD = "RoIAlign"
        rcfg.FAST_RCNN.ROI_XFORM_RESOLUTION = 7
        rcfg.FAST_RCNN.ROI_XFORM_SAMPLING_RATIO = 0
        rcfg.REFINE_TIMES = 3
        rcfg.p_seed = 0.4
        rcfg.step_rate = 0.05
        rcfg.Anti_noise_sampling = False
        rcfg.VGG_CLS_FEATURE = False
        rcfg.HRNET_CLS_FEATURE = True
        rcfg.TRAIN.FREEZE_CONV_BODY = False
        rcfg.HRNET.FREEZE_AT = 2
        rcfg.iou_dir = str(iou_dir)
        rcfg.asy_iou_dir = str(asy_dir)

    apply_rcfg()

    torch.manual_seed(2)
    model = mb.Generalized_RCNN()
    with torch.no_grad():  # non-trivial BN stats for the converter
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.2)
                m.running_var.uniform_(0.7, 1.3)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0.0, 0.05)

    rng = np.random.RandomState(23)
    batch = make_microbatch(
        rng, image_hw=IMAGE_HW, n_props=N_PAD, n_valid=N_VALID,
        num_classes=20, n_labels=3, mask_grid=64,
    )
    name = "fixture_hr48"
    with open(iou_dir / f"{name}.pkl", "wb") as f:
        pickle.dump(batch["iou_map"][:N_VALID, :N_VALID].astype(np.float32), f)
    with open(asy_dir / f"{name}.pkl", "wb") as f:
        pickle.dump(batch["asy_iou_map"][:N_VALID, :N_VALID].astype(np.float32), f)
    path = os.path.join("/nonexistent", name + ".jpg")

    from cim_tpu.utils.torch_weights import convert_reference_checkpoint

    variables = convert_reference_checkpoint(
        model.state_dict(), conv_body="hrnet48", refine_times=3
    )
    variables = jax.tree.map(jnp.asarray, variables)
    return model, variables, batch, path, apply_rcfg


def _our_hrnet_cfg():
    from cim_tpu.config import load_cfg

    cfg = clone_cfg(load_cfg(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "hrnet48_voc.yaml")
    ))
    cfg.REFINE_TIMES = 3
    cfg.p_seed = 0.4
    cfg.step_rate = 0.05
    cfg.adj_thr = 0.85
    cfg.Anti_noise_sampling = False
    cfg.TPU.PRECISION = "f32"
    cfg.TPU.PROPOSAL_PAD = N_PAD
    cfg.TPU.MAX_CLUSTERS = 8
    cfg.TPU.PALLAS_ROI_ALIGN = False
    cfg.TPU.REMAT_BOX_HEAD = False
    cfg.TPU.MAX_ADAPTIVE_GRID = 3
    return cfg


def test_eval_refine_scores_match_reference_model_hrnet(ref_setup_hrnet):
    _eval_parity(ref_setup_hrnet, cfg=_our_hrnet_cfg())


def test_train_losses_match_reference_model_hrnet(ref_setup_hrnet):
    _train_parity(ref_setup_hrnet, cfg=_our_hrnet_cfg())


def _torch_inputs(batch, training):
    image = torch.from_numpy(
        np.ascontiguousarray(batch["image"].transpose(2, 0, 1))
    )[None]
    rois5 = np.concatenate(
        [np.zeros((N_VALID, 1), np.float32), batch["rois"][:N_VALID]], axis=1
    )
    rois = torch.from_numpy(rois5)
    masks = torch.from_numpy(batch["masks"][:N_VALID])
    labels = torch.from_numpy(batch["labels"][None])
    mat = torch.from_numpy(batch["mat"][:N_VALID].astype(np.float32))
    gtrois = torch.zeros((1, 5), dtype=torch.float32)
    index = torch.arange(N_VALID, dtype=torch.float32)
    if training:
        # training inputs arrive with the loader's batch dim and are
        # squeezed inside forward (model_builder.py:120-126)
        rois, masks, labels, mat, index = (
            t[None] for t in (rois, masks, labels, mat, index)
        )
    return image, rois, masks, labels, gtrois, mat, index


def _eval_parity(setup, conv_body=None, cfg=None):
    """Eval forward: data -> conv body -> mmcv-RoIAlign MaskFuse ->
    cls_iou heads -> testing_function (model_builder.py:60-68), reference
    executed vs the flax stack with converted weights."""
    model, variables, batch, path, apply_rcfg = setup
    apply_rcfg()
    cfg = cfg if cfg is not None else _our_cfg(conv_body)
    image, rois, masks, labels, gtrois, mat, index = _torch_inputs(
        batch, training=False
    )
    model.eval()
    with torch.no_grad():
        rd = model(image, rois, masks, labels, gtrois, mat, path=path)
    want = [r.numpy() for r in rd["refine_score"]]  # K x (N, C) no-bg scores

    jmodel = build_model(cfg)
    out = jax.jit(jmodel.apply)(
        variables,
        jnp.asarray(batch["image"]),
        jnp.asarray(batch["rois"]),
        jnp.asarray(batch["masks"]),
        jnp.asarray(batch["valid"]),
    )
    out = jax.tree.map(np.asarray, out)
    got = [
        (out["refine_cls"][k, :N_VALID] * out["refine_iou"][k, :N_VALID])[:, 1:]
        for k in range(3)
    ]
    for k in range(3):
        np.testing.assert_allclose(
            got[k], want[k], rtol=2e-3, atol=2e-4,
            err_msg=f"refine_score[{k}] diverged from the executed reference",
        )


def _train_parity(setup, conv_body=None, cfg=None):
    """Training forward: the reference's own loss assembly
    (model_builder.py:161-207 — per-branch CIM_layer with threshold ramp,
    lambda=3 on branch 0, iou x3, mil_bag_loss + PCL_loss accumulation,
    iou-pkl reads) executed end to end vs engine.train.compute_losses."""
    model, variables, batch, path, apply_rcfg = setup
    apply_rcfg()
    cfg = cfg if cfg is not None else _our_cfg(conv_body)
    image, rois, masks, labels, gtrois, mat, index = _torch_inputs(
        batch, training=True
    )
    model.train()
    with _cpu_cuda():
        rd = model(
            image, rois, masks, labels, gtrois, mat, path=path, index=index
        )
    want = {k: float(v.detach()) for k, v in rd["losses"].items()}
    # the fixture must actually exercise every branch
    assert want["cls_loss"] != 0.0 and want["bag_loss"] != 0.0
    assert want["pcl_loss"] != 0.0

    jmodel = build_model(cfg)

    def loss_fn(batch_j):
        out = jmodel.apply(
            variables, batch_j["image"], batch_j["rois"], batch_j["masks"],
            batch_j["valid"],
        )
        return compute_losses(cfg, out, batch_j, jax.random.PRNGKey(0))

    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    got = jax.tree.map(np.asarray, jax.jit(loss_fn)(batch_j))

    for key in ("bag_loss", "pcl_loss", "cls_loss", "iou_loss"):
        np.testing.assert_allclose(
            got[key], want[key], rtol=5e-3, atol=5e-4,
            err_msg=f"{key} diverged from the executed reference assembly",
        )


class _RoIAlignDiffShim:
    """mmcv.ops.RoIAlign-shaped wrapper over the differentiable torch
    RoIAlign (tests/oracle_model.TorchRoIAlignDiff) so torch autograd
    flows through the reference model's roi_feature_transform; drops the
    batch-index column the reference prepends."""

    def __init__(self, output_size, spatial_scale=1.0, sampling_ratio=0,
                 *args, **kwargs):
        from tests.oracle_model import TorchRoIAlignDiff

        self.inner = TorchRoIAlignDiff(
            output_size, float(spatial_scale), int(sampling_ratio)
        )

    def __call__(self, feat, rois):
        # the reference MaskFuse .view()s the output: make it contiguous
        return self.inner(feat, rois[:, 1:5]).contiguous()


def _train_grad_parity(setup, conv_body, convert_grads):
    """END-TO-END BACKWARD parity vs the *executed* reference model:
    d(sum of losses)/d(params) through the reference's OWN forward +
    loss assembly (model_builder.py:161-207) under torch autograd,
    compared per-leaf against jax.grad of engine.train.compute_losses
    with the same converter the checkpoints use (layout transposes are
    linear, so gradients map identically).

    tests/test_full_pipeline_parity.py pins gradients against the
    transliterated oracle; this closes the last transliteration
    dependency in the backward chain — the only non-reference code in
    the torch graph is the differentiable RoIAlign stand-in (same mmcv
    spec the forward shim transliterates from the CUDA kernel).

    FREEZE_AT leaves get requires_grad flipped ON for this test so torch
    produces real gradients for EVERY leaf (freezing is an optimizer
    concern on both sides — the reference masks updates via
    requires_grad, we via the optimizer mask — the raw gradient math is
    identical and fully compared)."""
    model, variables, batch, path, apply_rcfg = setup
    apply_rcfg()
    image, rois, masks, labels, gtrois, mat, index = _torch_inputs(
        batch, training=True
    )
    mb_mod = sys.modules["modeling.model_builder"]
    old_ra = mb_mod.RoIAlign
    mb_mod.RoIAlign = _RoIAlignDiffShim
    model.train()
    frozen = [p_ for p_ in model.parameters() if not p_.requires_grad]
    assert frozen, "fixture must exercise FREEZE_AT"
    for p_ in frozen:
        p_.requires_grad_(True)
    model.zero_grad(set_to_none=True)
    try:
        with _cpu_cuda():
            rd = model(
                image, rois, masks, labels, gtrois, mat, path=path,
                index=index,
            )
        total = sum(rd["losses"].values())
        assert float(total.detach()) > 0
        total.backward()
    finally:
        mb_mod.RoIAlign = old_ra
        for p_ in frozen:
            p_.requires_grad_(False)

    grads_sd = {
        n: (torch.zeros_like(p) if p.grad is None else p.grad)
        for n, p in model.named_parameters()
    }
    grads_sd.update(dict(model.named_buffers()))
    g_torch = convert_grads(grads_sd)

    cfg = _our_cfg(conv_body)
    jmodel = build_model(cfg)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    stats = variables.get("stats", {})

    def total_loss(params):
        v = {"params": params}
        if stats:
            v["stats"] = stats
        out = jmodel.apply(
            v, batch_j["image"], batch_j["rois"], batch_j["masks"],
            batch_j["valid"],
        )
        l = compute_losses(cfg, out, batch_j, jax.random.PRNGKey(0))
        return l["bag_loss"] + l["pcl_loss"] + l["cls_loss"] + l["iou_loss"]

    g_jax = jax.jit(jax.grad(total_loss))(variables["params"])

    flat_t = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, g_torch)
    )[0]
    flat_j = {
        jax.tree_util.keystr(kp): np.asarray(v)
        for kp, v in jax.tree_util.tree_flatten_with_path(g_jax)[0]
    }
    assert len(flat_t) == len(flat_j)
    checked = nonzero = 0
    for kp, gt in flat_t:
        key = jax.tree_util.keystr(kp)
        gj = flat_j[key]
        assert gj.shape == gt.shape, key
        nt, nj = np.linalg.norm(gt), np.linalg.norm(gj)
        if nt < 1e-7 and nj < 1e-7:
            checked += 1
            continue
        rel = np.linalg.norm(gj - gt) / (nt + 1e-12)
        assert rel < 2e-2, f"{key}: rel-L2 {rel:.4g} (|g|={nt:.3g})"
        checked += 1
        nonzero += 1
    assert checked == len(flat_t)
    assert nonzero > 20, f"only {nonzero} nonzero grad leaves"


def test_eval_refine_scores_match_reference_model(ref_setup):
    _eval_parity(ref_setup, "vgg16.dilated_conv5_body")


def test_train_losses_match_reference_model(ref_setup):
    _train_parity(ref_setup, "vgg16.dilated_conv5_body")


def test_eval_refine_scores_match_reference_model_resnet(ref_setup_resnet):
    _eval_parity(ref_setup_resnet, "resnet50.torch_resnet50")


def test_train_losses_match_reference_model_resnet(ref_setup_resnet):
    _train_parity(ref_setup_resnet, "resnet50.torch_resnet50")


def test_train_grads_match_reference_model(ref_setup):
    _train_grad_parity(ref_setup, "vgg16.dilated_conv5_body",
                       _convert_vgg_tree)


def test_train_grads_match_reference_model_resnet(ref_setup_resnet):
    from cim_tpu.utils.torch_weights import convert_reference_checkpoint

    _train_grad_parity(
        ref_setup_resnet, "resnet50.torch_resnet50",
        lambda sd: convert_reference_checkpoint(
            sd, conv_body="resnet50", refine_times=3
        )["params"],
    )


def test_tta_eval_matches_executed_reference_chain(ref_setup):
    """Multi-scale + hflip TTA parity vs the *executed* reference chain:
    core/test.py im_detect_bbox_aug (blob prep, roi scaling, per-pass
    forward through the real Generalized_RCNN, hflip of boxes AND 7x7
    masks, K-head averaging test.py:130-133, AVG score heuristic
    :218-227) against engine.test.Evaluator.im_detect_all on the same
    uint8 BGR image, proposals, and converted weights. 4 passes:
    hflip @ TEST.SCALE, scale 64 (+hflip), identity."""
    model, variables, batch, path, apply_rcfg = ref_setup
    apply_rcfg()
    ref_test = _import_core_test()

    h, w = IMAGE_HW
    rng = np.random.RandomState(13)
    im_bgr = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    boxes = batch["rois"][:N_VALID]
    masks7 = batch["masks"][:N_VALID]

    rcfg = ref_test.cfg
    rcfg.immutable(False)
    rcfg.MODEL.NUM_CLASSES = 20
    rcfg.REFINE_TIMES = 3
    rcfg.DEDUP_BOXES = 0.0
    rcfg.TEST.SCALE = w  # max side == w -> im_scale 1.0 on the identity pass
    rcfg.TEST.MAX_SIZE = 2000
    rcfg.TEST.BBOX_AUG.ENABLED = True
    rcfg.TEST.BBOX_AUG.H_FLIP = True
    rcfg.TEST.BBOX_AUG.SCALES = (64,)
    rcfg.TEST.BBOX_AUG.MAX_SIZE = 2000
    rcfg.TEST.BBOX_AUG.SCALE_H_FLIP = True
    rcfg.TEST.BBOX_AUG.ASPECT_RATIOS = ()
    rcfg.TEST.BBOX_AUG.SCORE_HEUR = "AVG"
    rcfg.TEST.BBOX_AUG.COORD_HEUR = "ID"

    model.eval()
    wrapped = _UnwrapLists(model)
    with torch.no_grad(), _np_float_alias():
        want_scores, want_boxes, _, _ = ref_test.im_detect_bbox_aug(
            wrapped, im_bgr, box_proposals=boxes, masks=masks7,
            # mat is dead at eval (im_detect_bbox overwrites it with
            # np.array([0]), test.py:108) but the hflip pass .copy()s it
            mat=np.zeros((N_VALID, 21), np.float32),
            path=path, flag="ToTensor",
            labels=np.zeros((1, 20), np.float32),
        )

    from cim_tpu.engine.test import Evaluator

    cfg = _our_cfg()
    cfg.transform_mode = "ToTensor"
    cfg.TEST.SCALE = w
    cfg.TEST.MAX_SIZE = 2000
    cfg.TEST.BBOX_AUG.ENABLED = True
    cfg.TEST.BBOX_AUG.H_FLIP = True
    cfg.TEST.BBOX_AUG.SCALES = (64,)
    cfg.TEST.BBOX_AUG.MAX_SIZE = 2000
    cfg.TEST.BBOX_AUG.SCALE_H_FLIP = True
    cfg.TEST.BBOX_AUG.ASPECT_RATIOS = ()
    cfg.TEST.BBOX_AUG.SCORE_HEUR = "AVG"
    cfg.TEST.BBOX_AUG.COORD_HEUR = "ID"

    jmodel = build_model(cfg)
    ev = Evaluator(cfg, jmodel, variables)
    got_scores, got_boxes = ev.im_detect_all(im_bgr, boxes, masks7)

    np.testing.assert_allclose(
        got_scores, want_scores, rtol=2e-3, atol=2e-4,
        err_msg="TTA scores diverged from the executed reference chain",
    )
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-6)
