"""ctypes bindings for the native host kernels (host_kernels.cpp).

Builds lazily with g++ on first import (cached as host_kernels.so next to
the source). Falls back silently when no compiler is available — callers
(cim_tpu.ops.nms) keep their numpy paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "host_kernels.cpp")
_SO = os.path.join(_DIR, "host_kernels.so")

_lib = None


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
        _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.nms.restype = ctypes.c_int
    lib.nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.bbox_overlaps.restype = None
    lib.bbox_overlaps.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.rle_encode.restype = ctypes.c_int
    lib.rle_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.soft_nms.restype = ctypes.c_int
    lib.soft_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def nms(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy NMS (cython_nms semantics). Returns kept indices in
    descending score order."""
    lib = _load()
    dets = np.ascontiguousarray(dets, np.float32)
    n = dets.shape[0]
    keep = np.empty(n, np.int32)
    count = lib.nms(_ptr(dets, ctypes.c_float), n, float(thresh),
                    _ptr(keep, ctypes.c_int))
    return keep[:count].copy()


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    out = np.empty((boxes.shape[0], query.shape[0]), np.float32)
    lib.bbox_overlaps(
        _ptr(boxes, ctypes.c_float), boxes.shape[0],
        _ptr(query, ctypes.c_float), query.shape[0],
        _ptr(out, ctypes.c_float),
    )
    return out


def rle_encode_counts(mask: np.ndarray) -> list:
    """(H, W) mask -> column-major RLE counts (pycocotools order)."""
    lib = _load()
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    out = np.empty(h * w + 1, np.uint32)
    m = lib.rle_encode(_ptr(mask, ctypes.c_uint8), h, w,
                       _ptr(out, ctypes.c_uint32))
    return out[:m].tolist()


def soft_nms(dets: np.ndarray, sigma=0.5, nt=0.3, threshold=0.001,
             method=1):
    lib = _load()
    boxes = np.ascontiguousarray(dets, np.float32).copy()
    n = boxes.shape[0]
    inds = np.empty(n, np.int32)
    count = lib.soft_nms(
        _ptr(boxes, ctypes.c_float), n, float(sigma), float(nt),
        float(threshold), int(method), _ptr(inds, ctypes.c_int),
    )
    return boxes[:count].copy(), inds[:count].copy()
