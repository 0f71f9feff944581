"""COCO RLE mask codec in pure numpy (replaces pycocotools, absent here).

The COCO compressed RLE string format follows the `maskApi.c` LEB128-style
encoding; uncompressed RLE is a plain counts list, column-major (Fortran)
order.
"""

from __future__ import annotations

from typing import Dict, List, Union

import numpy as np


def rle_decode_counts(counts: List[int], h: int, w: int) -> np.ndarray:
    """Uncompressed counts -> (h, w) bool mask (column-major runs)."""
    total = h * w
    flat = np.zeros(total, dtype=bool)
    pos = 0
    val = False
    for c in counts:
        if val:
            flat[pos : pos + c] = True
        pos += c
        val = not val
    return flat.reshape((w, h)).T  # column-major


def rle_encode(mask: np.ndarray) -> Dict:
    """(h, w) bool -> uncompressed RLE dict."""
    h, w = mask.shape
    flat = mask.T.reshape(-1).astype(np.int8)
    # run lengths starting with 0-run
    diffs = np.nonzero(np.diff(flat))[0]
    runs = np.diff(np.concatenate([[-1], diffs, [flat.size - 1]]))
    if flat.size and flat[0] == 1:
        runs = np.concatenate([[0], runs])
    return {"counts": runs.astype(np.int64).tolist(), "size": [h, w]}


def rle_string_decode(s: Union[str, bytes], h: int, w: int) -> np.ndarray:
    """Compressed LEB128-ish string (maskApi rleFrString) -> (h, w) bool."""
    if isinstance(s, str):
        s = s.encode("ascii")
    counts = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return rle_decode_counts(counts, h, w)


def rle_string_encode(mask: np.ndarray) -> Dict:
    """(h, w) bool -> compressed RLE dict (maskApi rleToString)."""
    h, w = mask.shape
    counts = rle_encode(mask)["counts"]
    out = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (c & 0x10)) or (x == -1 and (c & 0x10)))
            if more:
                c |= 0x20
            out.append(c + 48)
    return {"counts": out.decode("ascii"), "size": [h, w]}


def decode_segmentation(seg, h: int, w: int) -> np.ndarray:
    """COCO 'segmentation' field (polygon list / RLE dict) -> bool mask."""
    if isinstance(seg, dict):
        counts = seg["counts"]
        sh, sw = seg.get("size", (h, w))
        if isinstance(counts, list):
            return rle_decode_counts(counts, sh, sw)
        return rle_string_decode(counts, sh, sw)
    if isinstance(seg, list):
        from ..structures.masks import polygons_to_bitmask

        return polygons_to_bitmask([np.asarray(p) for p in seg], h, w)
    raise ValueError(f"Unsupported segmentation type: {type(seg)}")


def rle_area(rle: Dict) -> int:
    counts = rle["counts"]
    if isinstance(counts, list):
        return int(sum(counts[1::2]))
    h, w = rle["size"]
    return int(rle_string_decode(counts, h, w).sum())
