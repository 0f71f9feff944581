"""ctypes bridge to the native RLE ops (csrc/rle.cpp).

Reference parity: pycocotools maskApi.c — the C layer under COCO mask
evaluation. Pair IoU works directly on run-length counts (no decode), which
is what makes large-scale segm mAP evaluation tractable. Built on first use
with g++ (same pattern as evaluation/fast_eval_api.py); every entry point
degrades to the pure-numpy codec in rle.py when the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional

import numpy as np

from . import rle as pyrle

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")
_LIB_PATH = os.path.join(_CSRC, "librle.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    src = os.path.join(_CSRC, "rle.cpp")
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _LIB_PATH],
                check=True,
                capture_output=True,
            )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning(f"native rle build failed ({e}); numpy fallback")
        _build_failed = True
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    lib.rle_decode_string.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, i64p, ctypes.c_int64,
    ]
    lib.rle_decode_string.restype = ctypes.c_int64
    lib.rle_area.argtypes = [i64p, ctypes.c_int64]
    lib.rle_area.restype = ctypes.c_int64
    lib.rle_iou_batch.argtypes = [
        i64p, i64p, ctypes.c_int64, i64p, i64p, ctypes.c_int64, u8p, f64p,
    ]
    lib.rle_iou_batch.restype = None
    _lib = lib
    return _lib


def counts_from_seg(seg, h: int, w: int) -> np.ndarray:
    """COCO segmentation (RLE dict str/list counts, or polygons) ->
    int64 run-length counts (column-major, starting with a 0-run)."""
    if isinstance(seg, dict):
        counts = seg["counts"]
        if isinstance(counts, list):
            return np.asarray(counts, np.int64)
        sh, sw = seg.get("size", (h, w))
        lib = get_lib()
        if lib is not None:
            if isinstance(counts, str):
                counts = counts.encode("ascii")
            buf = np.zeros(sh * sw + 2, np.int64)
            n = lib.rle_decode_string(counts, len(counts), buf, buf.size)
            if n >= 0:
                return buf[:n].copy()
        return np.asarray(
            pyrle.rle_encode(pyrle.decode_segmentation(seg, h, w))["counts"], np.int64
        )
    mask = pyrle.decode_segmentation(seg, h, w)
    return np.asarray(pyrle.rle_encode(mask)["counts"], np.int64)


def rle_iou_batch(
    det_segs: List, gt_segs: List, iscrowd: np.ndarray, h: int, w: int
) -> Optional[np.ndarray]:
    """(D,) x (G,) segmentations -> (D, G) IoU, crowd-aware. None if the
    native library is unavailable (caller falls back to the numpy path)."""
    lib = get_lib()
    if lib is None:
        return None
    d, g = len(det_segs), len(gt_segs)
    out = np.zeros((d, g), np.float64)
    if d == 0 or g == 0:
        return out
    dc = [counts_from_seg(s, h, w) for s in det_segs]
    gc = [counts_from_seg(s, h, w) for s in gt_segs]
    det_off = np.zeros(d + 1, np.int64)
    gt_off = np.zeros(g + 1, np.int64)
    for i, c in enumerate(dc):
        det_off[i + 1] = det_off[i] + c.size
    for j, c in enumerate(gc):
        gt_off[j + 1] = gt_off[j] + c.size
    det_flat = np.concatenate(dc) if det_off[-1] else np.zeros(0, np.int64)
    gt_flat = np.concatenate(gc) if gt_off[-1] else np.zeros(0, np.int64)
    lib.rle_iou_batch(
        np.ascontiguousarray(det_flat),
        det_off,
        d,
        np.ascontiguousarray(gt_flat),
        gt_off,
        g,
        np.ascontiguousarray(iscrowd.astype(np.uint8)),
        out,
    )
    return out
