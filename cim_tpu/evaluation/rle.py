"""COCO run-length-encoding codec (numpy; format-compatible with
pycocotools).

pycocotools is not vendored; this module implements the same on-disk
format (the base-48 LEB-style "counts" strings produced by maskApi.c
rleToString/rleFrString) so result JSONs interoperate with standard COCO
tooling. Used by the instance-segmentation evaluator
(reference tools/evaluation.py:119-138 coco_encode path,
lib/utils/mask_eval_utils.py:112-117) and the pseudo-label exporter.
"""
from __future__ import annotations

import numpy as np


def mask_to_rle_counts(mask: np.ndarray) -> list:
    """(H, W) {0,1} mask -> uncompressed RLE counts (column-major, starting
    with the zero run)."""
    try:
        from cim_tpu.native import rle_encode_counts

        return rle_encode_counts(np.asarray(mask, np.uint8))
    except Exception:
        pass
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    n = flat.size
    if n == 0:
        return [0]
    change = np.nonzero(np.diff(flat))[0] + 1
    runs = np.diff(np.concatenate([[0], change, [n]])).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return runs


def rle_counts_to_mask(counts, h: int, w: int) -> np.ndarray:
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos : pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape((h, w), order="F")


def counts_to_string(counts) -> str:
    """Compress counts to the COCO string form (maskApi.c rleToString)."""
    out = []
    cnts = list(counts)
    for i, x in enumerate(cnts):
        if i > 2:
            x -= cnts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def string_to_counts(s: str) -> list:
    """Decompress a COCO counts string (maskApi.c rleFrString)."""
    cnts = []
    i = 0
    m = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if m > 2:
            x += cnts[m - 2]
        cnts.append(x)
        m += 1
    return cnts


def encode(mask: np.ndarray) -> dict:
    """(H, W) mask -> {'size': [H, W], 'counts': str} (compressed RLE)."""
    h, w = mask.shape
    return {
        "size": [int(h), int(w)],
        "counts": counts_to_string(mask_to_rle_counts(mask)),
    }


def decode(rle: dict) -> np.ndarray:
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = string_to_counts(counts)
    elif isinstance(counts, bytes):
        counts = string_to_counts(counts.decode("ascii"))
    return rle_counts_to_mask(counts, h, w)


def area(rle: dict) -> int:
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = string_to_counts(
            counts if isinstance(counts, str) else counts.decode("ascii")
        )
    return int(sum(counts[1::2]))


def to_bbox(rle: dict) -> np.ndarray:
    """RLE -> xywh bbox (maskApi.c rleToBbox semantics)."""
    m = decode(rle)
    ys, xs = np.nonzero(m)
    if len(ys) == 0:
        return np.zeros(4, np.float32)
    return np.array(
        [xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1],
        np.float32,
    )


def iou_rle(dts: list, gts: list, iscrowd=None) -> np.ndarray:
    """Pairwise mask IoU between RLE lists (pycocotools mask.iou semantics:
    for crowd gt, the union is just the dt area)."""
    d = len(dts)
    g = len(gts)
    out = np.zeros((d, g), np.float64)
    if d == 0 or g == 0:
        return out
    dm = [decode(r).astype(bool) for r in dts]
    gm = [decode(r).astype(bool) for r in gts]
    da = [m.sum() for m in dm]
    ga = [m.sum() for m in gm]
    for j in range(g):
        crowd = bool(iscrowd[j]) if iscrowd is not None else False
        for i in range(d):
            inter = np.logical_and(dm[i], gm[j]).sum()
            union = da[i] if crowd else da[i] + ga[j] - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out
