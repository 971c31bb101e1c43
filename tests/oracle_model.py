"""Torch oracle of the FULL reference forward + loss assembly (test-only).

Fresh transliteration (not a copy) of the reference's assembled pipeline for
golden full-chain comparison against cim_tpu:

- ResNet-50-C4 trunk with permanently-eval BatchNorm
  (reference lib/modeling/resnet50.py:17-91; torchvision bottleneck layout,
  stride on the 3x3 conv);
- MaskFuse box head (lib/modeling/resnet50.py:94-138) with the numpy
  RoIAlign oracle (tests/oracles.py, mmcv aligned=True semantics) standing
  in for mmcv.ops.RoIAlign (torchvision is not installed here);
- cls_iou_model heads (lib/modeling/heads.py:168-219);
- loss assembly over K CIM branches (lib/modeling/model_builder.py:161-207)
  on top of the numpy mining/loss oracles in tests/oracle_cim.py.

State-dict naming matches reference checkpoints (Conv_Body. / Box_Head. /
cls_iou_model. prefixes, model_builder.py:82-87) so that
cim_tpu.utils.torch_weights.convert_reference_checkpoint consumes the
state_dict of this oracle unchanged — the same weights drive both sides.
"""
import numpy as np
import torch
import torch.nn as nn

from tests import oracle_cim
from tests.oracles import roi_align_oracle


class Bottleneck(nn.Module):
    """torchvision-v1.5 bottleneck: 1x1 -> 3x3(stride) -> 1x1, x4 width."""

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + identity)


def _stage(inplanes, planes, blocks, stride):
    layers = [Bottleneck(inplanes, planes, stride=stride, downsample=True)]
    for _ in range(1, blocks):
        layers.append(Bottleneck(planes * 4, planes))
    return nn.Sequential(*layers)


class TorchResNet50C4(nn.Module):
    """conv1..layer3 trunk, reference res1..res4 attribute naming
    (resnet50.py:26-33); BN held in eval mode permanently (:63-68)."""

    dim_out = 1024
    spatial_scale = 1.0 / 16.0

    def __init__(self):
        super().__init__()
        self.res1 = nn.Sequential(
            nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
            nn.BatchNorm2d(64),
            nn.ReLU(inplace=True),
            nn.MaxPool2d(3, stride=2, padding=1),
        )
        self.res2 = _stage(64, 64, 3, 1)
        self.res3 = _stage(256, 128, 4, 2)
        self.res4 = _stage(512, 256, 6, 2)

    def forward(self, x):
        return self.res4(self.res3(self.res2(self.res1(x))))


class NumpyRoIAlign:
    """mmcv.ops.RoIAlign stand-in via the numpy oracle (tests/oracles.py).
    Forward-only; aligned=True, adaptive sampling (sampling_ratio=0)."""

    def __init__(self, output_size, spatial_scale, sampling_ratio=0):
        self.output_size = output_size
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio

    def __call__(self, feat_nchw, rois_xyxy):
        feat = feat_nchw[0].detach().numpy().transpose(1, 2, 0)  # (H, W, C)
        out = roi_align_oracle(
            feat,
            rois_xyxy.detach().numpy(),
            self.output_size,
            self.spatial_scale,
            self.sampling_ratio,
            aligned=True,
        )  # (N, R, R, C)
        return torch.from_numpy(out.transpose(0, 3, 1, 2).copy())


class TorchMaskFuse(nn.Module):
    """Reference MaskFuse (resnet50.py:94-138): RoIAlign -> mask gating ->
    concat -> 3x3 conv -> two FC-4096."""

    dim_out = 4096

    def __init__(self, dim_in, spatial_scale, roi_size=7, sampling_ratio=0):
        super().__init__()
        self.dim_in = dim_in
        self.roi_align = NumpyRoIAlign(roi_size, spatial_scale, sampling_ratio)
        self.mask_branch = nn.Sequential(
            nn.Conv2d(dim_in * 2, dim_in, 3, padding=1), nn.ReLU()
        )
        self.seg_fc = nn.Sequential(
            nn.Linear(dim_in * roi_size**2, 4096),
            nn.ReLU(),
            nn.Linear(4096, 4096),
            nn.ReLU(),
        )

    def forward(self, feat, rois, masks):
        box_x = self.roi_align(feat, rois)  # (N, C, 7, 7)
        mask_x = box_x * masks.unsqueeze(1)  # broadcast over channels
        x = torch.cat([box_x, mask_x], dim=1)
        x = self.mask_branch(x)
        return self.seg_fc(x.reshape(x.size(0), -1))


class TorchClsIou(nn.Module):
    """Reference cls_iou_model (heads.py:168-219)."""

    def __init__(self, dim_in, dim_out, refine_times):
        super().__init__()
        self.classifier = nn.Linear(dim_in, dim_out)
        self.detector = nn.Linear(dim_in, dim_out)
        self.refine_cls = nn.ModuleList(
            nn.Linear(dim_in, dim_out) for _ in range(refine_times)
        )
        self.refine_iou = nn.ModuleList(
            nn.Linear(dim_in, dim_out) for _ in range(refine_times)
        )

    def forward(self, seg_x):
        predict_cls = torch.softmax(self.classifier(seg_x), dim=-1)
        predict_det = torch.softmax(self.detector(seg_x), dim=0)
        ref_cls = [torch.softmax(m(seg_x), dim=-1) for m in self.refine_cls]
        ref_iou = [torch.sigmoid(m(seg_x)) for m in self.refine_iou]
        return predict_cls, predict_det, ref_cls, ref_iou


class TorchCIMOracle(nn.Module):
    """Assembled Generalized_RCNN twin (model_builder.py:71-213) with
    reference state-dict naming. Conv body defaults to ResNet-50-C4."""

    def __init__(self, num_classes=20, refine_times=3, conv_body=None):
        super().__init__()
        self.Conv_Body = conv_body if conv_body is not None else TorchResNet50C4()
        self.Box_Head = TorchMaskFuse(
            self.Conv_Body.dim_out, self.Conv_Body.spatial_scale
        )
        self.cls_iou_model = TorchClsIou(
            self.Box_Head.dim_out, num_classes + 1, refine_times
        )
        # permanently-eval BN (resnet50.py:63-68)
        self.eval()

    @torch.no_grad()
    def forward(self, image_chw, rois, masks):
        """image_chw (3, H, W) float; rois (N, 4) xyxy; masks (N, 7, 7)."""
        feat = self.Conv_Body(image_chw.unsqueeze(0))
        seg_x = self.Box_Head(feat, rois, masks)
        return self.cls_iou_model(seg_x)


def randomize_bn_stats(model, rng):
    """Give BatchNorms non-trivial running statistics so frozen-BN math is
    actually exercised (fresh BN has mean 0 / var 1 == identity)."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            n = m.running_mean.numel()
            m.running_mean.copy_(torch.from_numpy(rng.randn(n).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, n).astype(np.float32)))
            m.weight.data.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, n).astype(np.float32)))
            m.bias.data.copy_(torch.from_numpy(rng.randn(n).astype(np.float32) * 0.1))


def oracle_loss_assembly(
    predict_cls,
    predict_det,
    ref_cls,
    ref_iou,
    labels,
    mat,
    iou_map,
    asy_iou_map,
    p_seed=0.1,
    step_rate=0.0,
    con_thr=0.85,
):
    """Reference loss assembly (model_builder.py:161-207) in numpy, on top
    of tests/oracle_cim.py. All inputs numpy, no padding. Returns the dict
    {bag_loss, pcl_loss, cls_loss, iou_loss}."""
    c = labels.shape[0]
    losses = {"bag_loss": 0.0, "pcl_loss": 0.0, "cls_loss": 0.0, "iou_loss": 0.0}
    for k, (cls_score, iou_score) in enumerate(zip(ref_cls, ref_iou)):
        lmda = 3.0 if k == 0 else 1.0
        src_cls, src_det = (
            (predict_cls, predict_det) if k == 0 else (ref_cls[k - 1], ref_iou[k - 1])
        )
        # background stripping (heads.py:327-328)
        sc = src_cls[:, 1:] if src_cls.shape[-1] == c + 1 else src_cls
        sd = src_det[:, 1:] if src_det.shape[-1] == c + 1 else src_det
        cls_thr = 0.25 + step_rate * k  # nms_thr == cls_thr (heads.py:227)
        iou_thr = 0.5 + step_rate * k
        gt_labels, gt_weights, gt_idxs, asy_flag = oracle_cim.cim_label(
            sc, sd, labels, iou_map, asy_iou_map, p_seed, cls_thr, con_thr
        )
        pseudo_labels, pseudo_iou, loss_weights = oracle_cim.assign_forward(
            gt_labels, gt_weights, gt_idxs, asy_flag, iou_map, cls_thr, iou_thr
        )
        if pseudo_labels is None:  # model_builder.py:189-190
            continue
        cls_l, iou_l, bag_l = oracle_cim.cls_iou_loss(
            cls_score, iou_score, pseudo_labels, pseudo_iou,
            lmda * loss_weights, labels,
        )
        losses["cls_loss"] += cls_l
        losses["iou_loss"] += 3.0 * iou_l
        losses["bag_loss"] += bag_l
    losses["bag_loss"] += oracle_cim.mil_bag_loss(predict_cls, predict_det, labels)
    losses["pcl_loss"] += oracle_cim.pcl_loss(predict_cls, mat, labels)
    return losses


# --------------------------------------------------------------------- #
# Differentiable pieces for end-to-end GRADIENT parity
# --------------------------------------------------------------------- #


class TorchRoIAlignDiff:
    """Differentiable torch RoIAlign with the same mmcv aligned=True
    semantics as tests/oracles.py:roi_align_oracle. The sampling grid and
    bilinear weights are computed in numpy from the (constant) rois and
    applied to the feature map with one index_add, so torch autograd
    propagates the exact bilinear-scatter gradient to the features —
    matching the reference CUDA backward
    (lib/modeling/roi_xfrom/roi_align/src/roi_align_kernel.cu)."""

    def __init__(self, output_size, spatial_scale, sampling_ratio=0,
                 aligned=True, grid_cap=None):
        self.output_size = output_size
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio
        self.aligned = aligned
        self.grid_cap = grid_cap

    def __call__(self, feat_nchw, rois_t):
        import math

        feat = feat_nchw[0].permute(1, 2, 0)  # (H, W, C), keeps grad
        h, w, c = feat.shape
        rois = rois_t.detach().numpy()
        n = rois.shape[0]
        r = self.output_size
        offset = 0.5 if self.aligned else 0.0

        pix_idx, out_idx, wts = [], [], []

        def add_point(i_out, y, x, scale):
            if y < -1.0 or y > h or x < -1.0 or x > w:
                return
            y = max(y, 0.0)
            x = max(x, 0.0)
            y_low = int(math.floor(y))
            x_low = int(math.floor(x))
            if y_low >= h - 1:
                y_high = y_low = h - 1
                y = float(y_low)
            else:
                y_high = y_low + 1
            if x_low >= w - 1:
                x_high = x_low = w - 1
                x = float(x_low)
            else:
                x_high = x_low + 1
            ly, lx = y - y_low, x - x_low
            hy, hx = 1.0 - ly, 1.0 - lx
            for yy, xx, ww in (
                (y_low, x_low, hy * hx), (y_low, x_high, hy * lx),
                (y_high, x_low, ly * hx), (y_high, x_high, ly * lx),
            ):
                pix_idx.append(yy * w + xx)
                out_idx.append(i_out)
                wts.append(ww * scale)

        for i in range(n):
            x1 = rois[i, 0] * self.spatial_scale - offset
            y1 = rois[i, 1] * self.spatial_scale - offset
            x2 = rois[i, 2] * self.spatial_scale - offset
            y2 = rois[i, 3] * self.spatial_scale - offset
            roi_w, roi_h = x2 - x1, y2 - y1
            if not self.aligned:
                roi_w, roi_h = max(roi_w, 1.0), max(roi_h, 1.0)
            bin_w, bin_h = roi_w / r, roi_h / r
            sr = self.sampling_ratio
            gh = sr if sr > 0 else max(int(math.ceil(roi_h / r)), 1)
            gw = sr if sr > 0 else max(int(math.ceil(roi_w / r)), 1)
            if self.grid_cap is not None:
                gh, gw = min(gh, self.grid_cap), min(gw, self.grid_cap)
            scale = 1.0 / (gh * gw)
            for ph in range(r):
                for pw in range(r):
                    i_out = (i * r + ph) * r + pw
                    for iy in range(gh):
                        yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / gh
                        for ix in range(gw):
                            xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / gw
                            add_point(i_out, yy, xx, scale)

        flat = feat.reshape(-1, c)
        vals = flat[torch.tensor(pix_idx, dtype=torch.long)] * torch.tensor(
            wts, dtype=feat.dtype
        ).unsqueeze(1)
        out = torch.zeros(n * r * r, c, dtype=feat.dtype)
        out = out.index_add(0, torch.tensor(out_idx, dtype=torch.long), vals)
        return out.reshape(n, r, r, c).permute(0, 3, 1, 2)


def oracle_forward_grad(oracle, image_chw, rois, masks):
    """TorchCIMOracle.forward without no_grad (for backward parity).
    Swap oracle.Box_Head.roi_align to TorchRoIAlignDiff first."""
    feat = oracle.Conv_Body(image_chw.unsqueeze(0))
    seg_x = oracle.Box_Head(feat, rois, masks)
    return oracle.cls_iou_model(seg_x)


# Torch twins of the reference losses (heads.py:10-166), differentiable.
# Discrete mining outputs (pseudo labels / weights) enter as numpy
# constants — they are behind stop_gradient on the JAX side too.


def t_mil_bag_loss(p_cls, p_det, labels_t):
    pred = (p_cls * p_det).sum(0, keepdim=True).clamp(1e-6, 1 - 1e-6)
    lab = torch.cat([torch.ones(1, 1), labels_t[None, :]], 1)
    return -(lab * pred.log() + (1 - lab) * (1 - pred).log()).mean()


def t_loss_weight_bag_loss(predict, pseudo_labels, label_tmp, loss_weight):
    ind = torch.from_numpy(
        (((pseudo_labels != 0).sum(-1)) != 0).astype(np.float32)
    )
    tmp = torch.from_numpy((pseudo_labels != 0).astype(np.float32))
    fg_scores = ind[:, None] * predict * tmp
    fg_val, fg_idx = fg_scores.max(0)
    un_val, un_idx = predict.max(0)
    agg = (fg_val * label_tmp + un_val * (1 - label_tmp)).clamp(1e-6, 1 - 1e-6)
    flag = label_tmp == 1
    agg_idx = torch.where(flag, fg_idx, un_idx)
    w = torch.from_numpy(loss_weight.astype(np.float32))[agg_idx].clone()
    w[~flag] = 1.0
    loss = -(label_tmp * agg.log() + (1 - label_tmp) * (1 - agg).log()) * w
    return loss.mean()


def t_cls_iou_loss(cls_score, iou_score, pseudo_labels, pseudo_iou_labels,
                   loss_weights, labels_t):
    cls_score = cls_score.clamp(1e-6, 1 - 1e-6)
    iou_score = iou_score.clamp(1e-6, 1 - 1e-6)
    label_tmp = torch.cat([torch.ones(1), labels_t])
    bag = t_loss_weight_bag_loss(
        cls_score * iou_score, pseudo_labels, label_tmp, loss_weights
    )
    cls_l = torch.zeros(())
    iou_l = torch.zeros(())
    ind_np = ((pseudo_labels != 0).sum(-1)) != 0
    if ind_np.sum() != 0:
        sel = torch.from_numpy(ind_np)
        pl = torch.from_numpy((pseudo_labels[ind_np] != 0).astype(np.float32))
        pil = torch.from_numpy(pseudo_iou_labels[ind_np].astype(np.float32))
        cs, isc = cls_score[sel], iou_score[sel]
        lw = torch.from_numpy(loss_weights[ind_np].astype(np.float32))
        cls_l = (-pl * cs.log() * lw[:, None]).sum() / pl.sum()
        fg_np = ((pseudo_labels[ind_np][:, 1:] != 0).sum(-1)) != 0
        if fg_np.sum() != 0:
            fsel = torch.from_numpy(fg_np)
            fpl, fpil = pl[fsel], pil[fsel]
            fisc, flw = isc[fsel], lw[fsel]
            fisc = (fpl * fisc).sum(-1)
            d = (fisc - fpil).abs()
            sl1 = torch.where(d < 1, 0.5 * d * d, d - 0.5)
            iou_l = (sl1 * flw).sum() / fpl.sum()
    return cls_l, iou_l, bag


def t_pcl_loss(p_cls, mat, labels_t):
    pred = p_cls.clamp(1e-6, 1 - 1e-6)
    bg_cands = np.setdiff1d(mat[:, 0], [0])
    bg_ind = 10000 if len(bg_cands) == 0 else bg_cands[0]
    loss = torch.zeros(())
    fg_bg = 1e-6

    def mil(p, t):
        p = p.clamp(1e-6, 1 - 1e-6)
        return (-t * p.log() - (1 - t) * (1 - p).log()).mean()

    for cid in np.unique(mat):
        if cid != 0 and cid != bg_ind:
            tf = mat == cid
            rows = torch.from_numpy(tf.sum(1) != 0)
            col = torch.from_numpy((tf.sum(0) != 0).astype(np.float32))
            sub = pred[rows]
            fg_bg += sub.shape[0]
            loss = loss + sub.shape[0] * mil(sub.mean(0), col)
        elif cid == bg_ind:
            tf = mat == cid
            rows = torch.from_numpy(tf.sum(1) != 0)
            sub = pred[rows]
            gt = torch.from_numpy((mat[tf.sum(1) != 0] != 0).astype(np.float32))
            fg_bg += sub.shape[0]
            loss = loss + sub.shape[0] * mil(sub, gt)
    return 12 * loss / fg_bg


def torch_loss_assembly_grad(
    p_cls, p_det, r_cls, r_iou, labels, mat, iou_map, asy_iou_map,
    p_seed=0.1, step_rate=0.0, con_thr=0.85,
):
    """Differentiable twin of oracle_loss_assembly: same reference loss
    wiring (model_builder.py:161-207), torch scalars out. Mining runs in
    numpy on detached scores (stop_gradient on the JAX side)."""
    labels_t = torch.from_numpy(labels.astype(np.float32))
    c = labels.shape[0]
    losses = {
        "bag_loss": torch.zeros(()), "pcl_loss": torch.zeros(()),
        "cls_loss": torch.zeros(()), "iou_loss": torch.zeros(()),
    }
    for k, (cls_score, iou_score) in enumerate(zip(r_cls, r_iou)):
        lmda = 3.0 if k == 0 else 1.0
        src_cls, src_det = (
            (p_cls, p_det) if k == 0 else (r_cls[k - 1], r_iou[k - 1])
        )
        sc = src_cls.detach().numpy()
        sd = src_det.detach().numpy()
        sc = sc[:, 1:] if sc.shape[-1] == c + 1 else sc
        sd = sd[:, 1:] if sd.shape[-1] == c + 1 else sd
        cls_thr = 0.25 + step_rate * k
        iou_thr = 0.5 + step_rate * k
        gt_labels, gt_weights, gt_idxs, asy_flag = oracle_cim.cim_label(
            sc, sd, labels, iou_map, asy_iou_map, p_seed, cls_thr, con_thr
        )
        pseudo_labels, pseudo_iou, loss_weights = oracle_cim.assign_forward(
            gt_labels, gt_weights, gt_idxs, asy_flag, iou_map, cls_thr, iou_thr
        )
        if pseudo_labels is None:
            continue
        cls_l, iou_l, bag_l = t_cls_iou_loss(
            cls_score, iou_score, pseudo_labels, pseudo_iou,
            lmda * loss_weights, labels_t,
        )
        losses["cls_loss"] = losses["cls_loss"] + cls_l
        losses["iou_loss"] = losses["iou_loss"] + 3.0 * iou_l
        losses["bag_loss"] = losses["bag_loss"] + bag_l
    losses["bag_loss"] = losses["bag_loss"] + t_mil_bag_loss(p_cls, p_det, labels_t)
    losses["pcl_loss"] = losses["pcl_loss"] + t_pcl_loss(p_cls, mat, labels_t)
    return losses
