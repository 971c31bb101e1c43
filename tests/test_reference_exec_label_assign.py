"""Golden parity against the *executed* reference AGPL label assignment.

/root/reference/tools/pre/AGPL_label_assign.py assign_voc2012 runs for
REAL over a fixture image + COB .mat + COCO-json annotations, with the
PRM model replaced by a canned-peaks stand-in (the model's output
contract is exactly peaks + scores; everything downstream — the
score-ascending peak order, the 112-CRM coordinate mapping, the
covering-proposal supermask avg>0.7, the IoU>0.5 cluster assignment
with later-peak override, the bg cluster — is the reference's own code
and is the oracle for tools/pre/AGPL_label_assign.assign_image.

The mat this produces seeds PCL_loss clusters for every training run,
so exact cluster-index parity matters for artifact-level compatibility.

Shims: chainer's GPU dispatch (mask_utils), pycocotools.coco bound to
cim_tpu's COCO, torchvision transforms stubs faithful to the documented
semantics (only Resize/ToTensor/Normalize execute, on a fixture the
fake model ignores anyway), np.bool alias for the py36-era dtype use.
"""
from __future__ import annotations

import importlib.util
import os
import pickle
import sys
import types
import warnings

import numpy as np
import pytest
import torch
from scipy.io import savemat

REF_ROOT = "/root/reference"

cv2 = pytest.importorskip("cv2")

H, W = 48, 64  # proposal mask resolution


def _proposals(rng, n=6):
    masks = np.zeros((n, H, W), np.uint8)
    boxes = [(4, 6, 30, 40), (6, 8, 28, 38), (2, 2, 20, 22),
             (26, 30, 46, 60), (28, 34, 44, 58), (10, 44, 24, 62)]
    for i, (y1, x1, y2, x2) in enumerate(boxes):
        masks[i, y1:y2, x1:x2] = 1
    return masks


class _FakePRM(torch.nn.Module):
    """Stands in for peak_response_mapping(fc_resnet50): .inference() and
    .to() chain; __call__ returns canned visual_cues in the reference's
    format (valid_peak_list rows [batch, class, x, y] in 112-CRM space,
    ascending-score sort is done by the CALLER)."""

    def __init__(self, peaks_xyc, scores):
        super().__init__()
        self.peaks = peaks_xyc
        self.scores = scores

    def inference(self):
        return self

    def forward(self, inputs, boxes_cl, class_threshold=0, peak_threshold=10):
        if len(self.peaks) == 0:
            return None
        k = len(self.peaks)
        vpl = torch.tensor(
            [[0, c, x, y] for (x, y, c) in self.peaks], dtype=torch.long
        )
        return (
            None,                       # aggregation (unused)
            None,                       # class_response_maps (unused)
            vpl,
            [None] * k,                 # peak_response_maps (len drives loop)
            torch.tensor(self.scores, dtype=torch.float32),
        )


@pytest.fixture(scope="module")
def ref_assign(tmp_path_factory):
    from cim_tpu.evaluation.coco import COCO as OurCOCO

    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    class _Resize:
        def __init__(self, size):
            self.size = tuple(size)

        def __call__(self, img):
            return img.resize((self.size[1], self.size[0]))

    class _ToTensor:
        def __call__(self, img):
            a = np.asarray(img, np.float32) / 255.0
            return torch.from_numpy(a.transpose(2, 0, 1))

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

    class _RandomHorizontalFlip:
        def __init__(self, p=0.5):
            pass

        def __call__(self, x):
            return x

    stub("torch._six", string_classes=str, int_classes=int)
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.Resize, tr.ToTensor, tr.Normalize = _Resize, _ToTensor, _Normalize
    tr.Compose, tr.RandomHorizontalFlip = _Compose, _RandomHorizontalFlip
    tv.transforms = tr
    def _tiny_resnet50(*a, **k):
        # prm_model_gt builds fc_resnet50 at import time; only the
        # attribute structure is consumed (the fake PRM replaces the
        # model at call time), so tiny layers keep the import cheap
        import torch.nn as nn

        m = types.SimpleNamespace()
        m.conv1 = nn.Conv2d(3, 4, 1)
        m.bn1 = nn.BatchNorm2d(4)
        m.relu = nn.ReLU()
        m.maxpool = nn.MaxPool2d(2)
        class _Blk(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(4, 4, 1)

        m.layer1 = nn.Sequential(_Blk(), _Blk())
        m.layer2 = nn.Sequential(_Blk(), _Blk())
        m.layer3 = nn.Sequential(_Blk(), _Blk())
        m.layer4 = nn.Sequential(_Blk(), _Blk())
        return m

    tv.models = types.ModuleType("torchvision.models")
    tv.models.resnet50 = _tiny_resnet50
    stubs["torchvision"] = tv
    stubs["torchvision.transforms"] = tr
    stubs["torchvision.models"] = tv.models
    chainer = types.ModuleType("chainer")
    backends = types.ModuleType("chainer.backends")
    cuda = types.ModuleType("chainer.backends.cuda")
    cuda.get_array_module = lambda *a: np
    backends.cuda = cuda
    chainer.backends = backends
    stubs["chainer"] = chainer
    stubs["chainer.backends"] = backends
    stubs["chainer.backends.cuda"] = cuda
    stub("pycocotools")
    stub("pycocotools.mask")
    coco_mod = types.ModuleType("pycocotools.coco")
    coco_mod.COCO = OurCOCO
    stubs["pycocotools.coco"] = coco_mod
    stubs["pycocotools"].coco = coco_mod
    stubs["pycocotools"].mask = stubs["pycocotools.mask"]
    # prm_model_gt imports mmcv.ops.RoIAlign at module level (never
    # constructed by the assignment path)
    mmcv = types.ModuleType("mmcv")
    mops = types.ModuleType("mmcv.ops")
    mops.RoIAlign = object
    mops.RoIPool = object
    mmcv.ops = mops
    stubs["mmcv"] = mmcv
    stubs["mmcv.ops"] = mops
    # plotting-only imports at prm_model_gt.py:21-23, never reached
    sk = types.ModuleType("skimage")
    sk.__path__ = []
    skseg = types.ModuleType("skimage.segmentation")
    skseg.mark_boundaries = None
    sk.segmentation = skseg
    stubs["skimage"] = sk
    stubs["skimage.segmentation"] = skseg

    had = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF_ROOT)             # for `from lib.prm...`
    sys.path.insert(0, REF_ROOT + "/tools/pre")  # for `from pre_tools import *`
    added_bool = not hasattr(np, "bool")
    if added_bool:
        np.bool = bool
    cwd = os.getcwd()
    # prm_configs loads lib/prm/cls_labels.npy relative to cwd at import
    # time, and AGPL_label_assign makedirs ./data/trash at import — run
    # the import from a tmp dir that symlinks the npy so nothing is ever
    # written under the read-only reference tree
    impdir = tmp_path_factory.mktemp("agpl_import")
    (impdir / "lib" / "prm").mkdir(parents=True)
    os.symlink(REF_ROOT + "/lib/prm/cls_labels.npy",
               impdir / "lib" / "prm" / "cls_labels.npy")
    try:
        os.chdir(impdir)
        spec = importlib.util.spec_from_file_location(
            "_ref_agpl", REF_ROOT + "/tools/pre/AGPL_label_assign.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        os.chdir(cwd)
        sys.path.remove(REF_ROOT)
        sys.path.remove(REF_ROOT + "/tools/pre")
        if added_bool:
            del np.bool
        for k, v in had.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


IMG_ID = 20070001


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    import json

    root = tmp_path_factory.mktemp("agpl")
    (root / "data" / "VOC2012" / "JPEGImages").mkdir(parents=True)
    (root / "data" / "VOC2012" / "COB_SBD_trainaug").mkdir(parents=True)
    (root / "data" / "trash").mkdir(parents=True)
    rng = np.random.RandomState(5)
    cv2.imwrite(
        str(root / "data" / "VOC2012" / "JPEGImages" / "2007_0001.jpg"),
        rng.randint(0, 256, (H, W, 3)).astype(np.uint8),
    )
    masks = _proposals(rng)
    obj = np.empty((len(masks), 1), dtype=object)
    for i, m in enumerate(masks):
        obj[i, 0] = m
    savemat(
        str(root / "data" / "VOC2012" / "COB_SBD_trainaug" / "2007_0001.mat"),
        {"maskmat": obj},
    )
    ann = {
        "images": [{"id": IMG_ID, "file_name": "2007_0001.jpg",
                    "height": H, "width": W}],
        "annotations": [
            {"id": 1, "image_id": IMG_ID, "category_id": 3, "iscrowd": 0,
             "area": 10, "bbox": [1, 1, 5, 5]},
            {"id": 2, "image_id": IMG_ID, "category_id": 12, "iscrowd": 0,
             "area": 10, "bbox": [8, 8, 5, 5]},
        ],
        "categories": [{"id": c, "name": f"c{c}"} for c in range(1, 21)],
    }
    with open(root / "ann.json", "w") as f:
        json.dump(ann, f)
    return root, masks


# peaks in 112-CRM space as (x_crm, y_crm, class): two landing inside
# proposal groups (classes 2 and 11), one landing where NO proposal
# covers (the reference still advances the cluster index there), an
# override case (same area, higher score, different class), and an
# ASYMMETRIC peak (40, 95) that hits proposal 5 (rows 10-24, cols 44-62)
# only under the correct row<-x_crm*H/112, col<-y_crm*W/112 mapping — the
# transposed mapping lands on bare pixels, so a row/col swap in
# assign_image changes the mat and fails the parity assert
PEAKS = [(25, 30, 2), (80, 80, 11), (0, 111, 5), (27, 32, 11), (40, 95, 7)]
SCORES = [0.9, 0.8, 0.7, 0.95, 0.85]


def test_label_assignment_matches_executed_reference(ref_assign, tree,
                                                     monkeypatch):
    from cim_tpu.evaluation.coco import COCO as OurCOCO

    root, masks = tree
    monkeypatch.chdir(root)
    ref_assign.trash = str(root / "data" / "trash")
    model = _FakePRM(PEAKS, SCORES)
    cocoGt = OurCOCO(str(root / "ann.json"))

    added_bool = not hasattr(np, "bool")
    if added_bool:
        np.bool = bool
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # mean of empty slice (by design)
            ref_assign.assign_voc2012(
                [IMG_ID], 0, model, torch.device("cpu"), "voc2012", cocoGt
            )
    finally:
        if added_bool:
            del np.bool
    with open(root / "data" / "trash" /
              ref_assign.useless_file.format(0), "rb") as f:
        want = pickle.load(f)
    want_mat = want["mat"][0]

    sys.path.insert(0, "/root/repo/tools/pre")
    try:
        from AGPL_label_assign import assign_image
    finally:
        sys.path.remove("/root/repo/tools/pre")

    peaks = np.array([(x, y, c) for (x, y, c) in PEAKS], np.int64)
    got = assign_image(
        masks.astype(bool), peaks, np.array(SCORES, np.float32),
        num_peaks=len(PEAKS), num_classes=20, crm_size=112,
    )
    np.testing.assert_array_equal(got, want_mat)
    # the fixture must exercise assignment, override, AND the bg cluster
    assert (want_mat[:, 1:] != 0).any() and (want_mat[:, 0] != 0).any()


def test_label_assignment_no_peaks_matches_reference(ref_assign, tree,
                                                     monkeypatch):
    from cim_tpu.evaluation.coco import COCO as OurCOCO

    root, masks = tree
    monkeypatch.chdir(root)
    ref_assign.trash = str(root / "data" / "trash")
    model = _FakePRM([], [])
    cocoGt = OurCOCO(str(root / "ann.json"))
    added_bool = not hasattr(np, "bool")
    if added_bool:
        np.bool = bool
    try:
        ref_assign.assign_voc2012(
            [IMG_ID], 1, model, torch.device("cpu"), "voc2012", cocoGt
        )
    finally:
        if added_bool:
            del np.bool
    with open(root / "data" / "trash" /
              ref_assign.useless_file.format(1), "rb") as f:
        want = pickle.load(f)

    sys.path.insert(0, "/root/repo/tools/pre")
    try:
        from AGPL_label_assign import assign_image
    finally:
        sys.path.remove("/root/repo/tools/pre")

    got = assign_image(
        masks.astype(bool), np.zeros((0, 3), np.int64),
        np.zeros(0, np.float32), num_peaks=0, num_classes=20,
    )
    np.testing.assert_array_equal(got, want["mat"][0])
