"""ctypes bindings for the native evaluation kernels (native/eval_kernels.cpp).

The reference's evaluation inner loops are native (pycocotools C, mmcv C
IoU — SURVEY.md §2.4); this module is the framework's native counterpart,
with a transparent numpy fallback when the shared library hasn't been
built (``make -C native``).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "..", "..", "native", "libeval_kernels.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        # try building once (toolchain is available in the image)
        try:
            import subprocess
            subprocess.run(["make", "-C", os.path.dirname(path)],
                           check=True, capture_output=True)
        except Exception:
            _LIB = False
            return False
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _LIB = False
        return False
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64 = ctypes.c_int64
    lib.iou_xyxy.argtypes = [f32p, i64, f32p, i64, ctypes.c_float, f32p]
    lib.iou_xywh_crowd.argtypes = [f32p, i64, f32p, i64, u8p, f32p]
    lib.tpfp_greedy.argtypes = [f32p, f32p, i64, i64, u8p, ctypes.c_float,
                                f32p, f32p]
    lib.coco_match.argtypes = [f32p, i64, i64, u8p, u8p, f32p, i64, i32p,
                               u8p]
    _LIB = lib
    return lib


def _f32(a):
    return np.ascontiguousarray(a, np.float32)


def _ptr(a, tp):
    return a.ctypes.data_as(tp)


def available() -> bool:
    return bool(_load())


def iou_xyxy(dets: np.ndarray, gts: np.ndarray,
             use_legacy_coordinate: bool = False) -> Optional[np.ndarray]:
    lib = _load()
    if not lib:
        return None
    d, g = len(dets), len(gts)
    out = np.empty((d, g), np.float32)
    dets = _f32(dets)
    gts = _f32(gts)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.iou_xyxy(_ptr(dets, f32p), d, _ptr(gts, f32p), g,
                 1.0 if use_legacy_coordinate else 0.0, _ptr(out, f32p))
    return out


def tpfp_greedy(ious: np.ndarray, scores: np.ndarray,
                gt_ignore: Optional[np.ndarray],
                iou_thr: float) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if not lib:
        return None
    d, g = ious.shape
    tp = np.zeros(d, np.float32)
    fp = np.zeros(d, np.float32)
    ious = _f32(ious)
    scores = _f32(scores)
    gi = np.ascontiguousarray(
        gt_ignore if gt_ignore is not None else np.zeros(g, np.uint8),
        np.uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.tpfp_greedy(_ptr(ious, f32p), _ptr(scores, f32p), d, g,
                    _ptr(gi, u8p), float(iou_thr), _ptr(tp, f32p),
                    _ptr(fp, f32p))
    return tp, fp


def coco_match(ious: np.ndarray, gt_ignore: np.ndarray, gt_crowd: np.ndarray,
               thrs: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if not lib:
        return None
    d, g = ious.shape
    t = len(thrs)
    dt_match = np.full((t, d), -1, np.int32)
    dt_ignore = np.zeros((t, d), np.uint8)
    ious = _f32(ious)
    thrs = _f32(thrs)
    gi = np.ascontiguousarray(gt_ignore, np.uint8)
    gc = np.ascontiguousarray(gt_crowd, np.uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.coco_match(_ptr(ious, f32p), d, g, _ptr(gi, u8p), _ptr(gc, u8p),
                   _ptr(thrs, f32p), t, _ptr(dt_match, i32p),
                   _ptr(dt_ignore, u8p))
    return dt_match, dt_ignore
