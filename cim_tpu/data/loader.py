"""Host input pipeline: roidb -> fixed-shape device batches with prefetch.

Replaces the reference's torch DataLoader stack (lib/roi_data/loader.py,
minibatch.py) with a TPU-native design:

- every microbatch is FIXED SHAPE: proposals padded/sampled to
  cfg.TPU.PROPOSAL_PAD with a validity mask; images resized by a
  per-*step* random scale from TRAIN.SCALES and zero-padded to a
  (H, W) bucket (multiples of 128) — each bucket is one compiled program;
- a training step's n_devices x grad_accum images are drawn from the same
  (scale, aspect-bucket) group so they stack into one array (the
  reference instead re-jits nothing because torch is eager; XLA needs the
  grouping). Marginal scale distribution per image is preserved;
- per-image IoU / asymmetric-IoU matrices are joined HERE (bundled into
  the batch), not re-read from pickles inside model.forward like the
  reference (model_builder.py:147-159);
- proposal subsampling beyond the cap applies consistently to
  boxes/masks/mat/iou matrices (the reference's _sample_rois
  minibatch.py:92-106 samples only boxes — latent bug since the cap of
  4096 rarely triggers; here the cap is load-bearing so it is correct);
- background-thread prefetch replaces worker processes.
"""
from __future__ import annotations

import logging
import os
import pickle
import queue
import threading

import numpy as np

from cim_tpu.data.transforms import prep_image, scale_for_target

logger = logging.getLogger(__name__)

PAD_MULTIPLE = 128


def _bucket_hw(h: int, w: int):
    pad = lambda x: int(np.ceil(x / PAD_MULTIPLE) * PAD_MULTIPLE)
    return pad(h), pad(w)


def load_iou_maps(cfg, entry, index):
    """Load per-image (iou, asy_iou) from cfg.iou_dir / cfg.asy_iou_dir
    pkls (reference model_builder.py:147-159), subset to sampled index.
    Entries may also carry inline 'iou_map'/'asy_iou_map' (synthetic /
    pre-joined datasets)."""
    if "iou_map" in entry:
        iou = np.asarray(entry["iou_map"], np.float32)
        asy = np.asarray(entry["asy_iou_map"], np.float32)
    else:
        file_name = os.path.splitext(os.path.basename(entry["image"]))[0]
        with open(os.path.join(cfg.iou_dir, file_name + ".pkl"), "rb") as f:
            iou = np.asarray(pickle.load(f), np.float32)
        with open(os.path.join(cfg.asy_iou_dir, file_name + ".pkl"), "rb") as f:
            asy = np.asarray(pickle.load(f), np.float32)
    iou = iou[np.ix_(index, index)]
    asy = asy[np.ix_(index, index)]
    return iou, asy


def proposal_bucket(cfg, n: int) -> int:
    """Smallest configured proposal bucket >= n (capped at PROPOSAL_PAD).

    Proposal-count bucketing: padding every image to the flat 4096 cap
    wastes ~2x of the MaskFuse/head FLOPs at the typical ~2000 COB
    proposals per VOC image; each (scale, image-bucket, proposal-bucket)
    shape is one compiled program.
    """
    cap = cfg.TPU.PROPOSAL_PAD
    for b in sorted(cfg.TPU.PROPOSAL_BUCKETS or ()):
        if n <= b <= cap:
            return int(b)
    return int(cap)


def build_microbatch(cfg, entry, im_scale, bucket_hw, rng, image=None,
                     n_max=None):
    """One fixed-shape training microbatch from an roidb entry."""
    n_max = n_max if n_max is not None else cfg.TPU.PROPOSAL_PAD
    num_classes = cfg.MODEL.NUM_CLASSES

    if image is None:
        import cv2

        image = cv2.imread(entry["image"])
        assert image is not None, f"cannot read {entry['image']}"
        if entry.get("flipped"):
            image = image[:, ::-1, :]

    im = prep_image(image, im_scale, cfg.transform_mode, cfg.PIXEL_MEANS)
    hb, wb = bucket_hw
    im_p = np.zeros((hb, wb, 3), np.float32)
    im_p[: im.shape[0], : im.shape[1]] = im

    boxes = entry["boxes"]
    n = boxes.shape[0]
    if n > n_max:
        index = rng.permutation(n)[:n_max]
        index.sort()
    else:
        index = np.arange(n)
    n_keep = len(index)

    rois = np.zeros((n_max, 4), np.float32)
    rois[:n_keep] = boxes[index] * im_scale
    masks = np.zeros((n_max,) + entry["masks"].shape[1:], np.float32)
    masks[:n_keep] = entry["masks"][index]
    valid = np.zeros(n_max, bool)
    valid[:n_keep] = True

    mat = np.zeros((n_max, num_classes + 1), np.int32)
    if len(entry["mat"]):
        mat[:n_keep] = entry["mat"][index].astype(np.int32)

    iou_map = np.zeros((n_max, n_max), np.float16)
    asy_map = np.zeros((n_max, n_max), np.float16)
    iou, asy = load_iou_maps(cfg, entry, index)
    iou_map[:n_keep, :n_keep] = iou
    asy_map[:n_keep, :n_keep] = asy

    labels = entry["gt_classes"].reshape(-1)[:num_classes].astype(np.float32)

    return {
        "image": im_p,
        # true extent inside the zero-padded bucket: drives valid-extent
        # masking in the model (cim_tpu.models.layers.mask_valid_hw)
        "image_hw": np.array([im.shape[0], im.shape[1]], np.int32),
        "rois": rois,
        "masks": masks,
        "valid": valid,
        "labels": labels,
        "mat": mat,
        "iou_map": iou_map,
        "asy_iou_map": asy_map,
    }


class TrainLoader:
    """Iterator over stacked (n_devices, grad_accum, ...) batches.

    Epoch permutation + per-step random scale (reference
    MinibatchSampler loader.py:87-104 + scale choice minibatch.py:112).
    Groups same-bucket images so microbatches stack; a background thread
    keeps `prefetch` batches ready.
    """

    def __init__(self, cfg, roidb, n_devices: int, grad_accum: int,
                 seed: int = 3, prefetch: int = 2):
        self.cfg = cfg
        self.roidb = roidb
        self.n_devices = n_devices
        self.grad_accum = grad_accum
        self.per_step = n_devices * grad_accum
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = None

    # -------------------------------------------------------------- #
    def _entry_bucket(self, entry, scale):
        h, w = entry["height"], entry["width"]
        s = scale_for_target((h, w), scale, self.cfg.TRAIN.MAX_SIZE)
        return _bucket_hw(int(round(h * s)), int(round(w * s))), s

    def _produce(self):
        scales = list(self.cfg.TRAIN.SCALES)
        pending: dict = {}
        epoch_order = []
        pos = 0
        while not self._stop.is_set():
            if pos >= len(epoch_order):
                epoch_order = self.rng.permutation(len(self.roidb))
                pos = 0
            entry = self.roidb[epoch_order[pos]]
            pos += 1
            scale = scales[self.rng.randint(len(scales))]
            bucket, s = self._entry_bucket(entry, scale)
            n_bucket = proposal_bucket(self.cfg, len(entry["boxes"]))
            key = (scale, bucket, n_bucket)
            pending.setdefault(key, []).append((entry, s))
            if len(pending[key]) >= self.per_step:
                group = pending.pop(key)[: self.per_step]
                batch = self._stack(group, bucket, n_bucket)
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue

    def _stack(self, group, bucket, n_bucket=None):
        mbs = [
            build_microbatch(self.cfg, e, s, bucket, self.rng, n_max=n_bucket)
            for e, s in group
        ]
        out = {}
        for key in mbs[0]:
            flat = np.stack([mb[key] for mb in mbs])
            out[key] = flat.reshape(
                (self.n_devices, self.grad_accum) + flat.shape[1:]
            )
        return out

    # -------------------------------------------------------------- #
    def __iter__(self):
        if self._thread is None:
            self._thread = threading.Thread(target=self._produce, daemon=True)
            self._thread.start()
        return self

    def __next__(self):
        return self._queue.get()

    def close(self):
        self._stop.set()
        # drain so a blocked put() observes the stop event
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        if self._thread is not None:
            self._thread.join(timeout=5)
