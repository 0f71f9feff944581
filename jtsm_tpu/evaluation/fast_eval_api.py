"""ctypes bridge to the native COCOeval matcher.

Reference: detectron2/evaluation/fast_eval_api.py:10 (``COCOeval_opt``
wrapping `_C.COCOevalEvaluateImages`/`Accumulate`). pybind11 is not in this
image, so the native library exposes a C ABI compiled on first use with g++
(cached next to the source).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libcocoeval.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    src = os.path.join(_CSRC, "cocoeval.cpp")
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _LIB_PATH],
                check=True,
                capture_output=True,
            )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning(f"native cocoeval build failed ({e}); falling back to numpy")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _build():
        _build_failed = True
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    lib.cocoeval_match.argtypes = [
        ctypes.c_int64, i64p, i64p, i64p, f64p, u8p, u8p, u8p, f64p,
        ctypes.c_int64, ctypes.c_int64, u8p, u8p,
    ]
    lib.cocoeval_match.restype = None
    lib.cocoeval_box_iou.argtypes = [
        f64p, f64p, u8p, ctypes.c_int64, ctypes.c_int64, f64p,
    ]
    lib.cocoeval_box_iou.restype = None
    _lib = lib
    return _lib


def native_match_batch(
    pair_ious,  # list of (D, G) float64 arrays
    gt_ignore_list,  # list of (G,) bool (sorted order)
    gt_crowd_list,  # list of (G,) bool
    det_oor_list,  # list of (D,) bool
    thresholds: np.ndarray,
):
    """Run the C matcher over all pairs; returns (det_matched, det_ignore)
    as (T, D_total) plus det offsets."""
    lib = get_lib()
    assert lib is not None
    p = len(pair_ious)
    det_offsets = np.zeros(p + 1, np.int64)
    gt_offsets = np.zeros(p + 1, np.int64)
    iou_offsets = np.zeros(p + 1, np.int64)
    for i, iou in enumerate(pair_ious):
        det_offsets[i + 1] = det_offsets[i] + iou.shape[0]
        gt_offsets[i + 1] = gt_offsets[i] + iou.shape[1]
        iou_offsets[i + 1] = iou_offsets[i] + iou.size
    det_total = int(det_offsets[-1])
    t = len(thresholds)

    ious_flat = (
        np.concatenate([a.reshape(-1) for a in pair_ious]).astype(np.float64)
        if det_total or gt_offsets[-1]
        else np.zeros(0, np.float64)
    )
    gt_ignore = (
        np.concatenate(gt_ignore_list).astype(np.uint8)
        if gt_offsets[-1]
        else np.zeros(0, np.uint8)
    )
    gt_crowd = (
        np.concatenate(gt_crowd_list).astype(np.uint8)
        if gt_offsets[-1]
        else np.zeros(0, np.uint8)
    )
    det_oor = (
        np.concatenate(det_oor_list).astype(np.uint8)
        if det_total
        else np.zeros(0, np.uint8)
    )

    det_matched = np.zeros((t, det_total), np.uint8)
    det_ignore = np.zeros((t, det_total), np.uint8)
    lib.cocoeval_match(
        p,
        np.ascontiguousarray(det_offsets),
        np.ascontiguousarray(gt_offsets),
        np.ascontiguousarray(iou_offsets),
        np.ascontiguousarray(ious_flat),
        np.ascontiguousarray(gt_ignore),
        np.ascontiguousarray(gt_crowd),
        np.ascontiguousarray(det_oor),
        np.ascontiguousarray(thresholds.astype(np.float64)),
        t,
        det_total,
        det_matched,
        det_ignore,
    )
    return det_matched.astype(bool), det_ignore.astype(bool), det_offsets
