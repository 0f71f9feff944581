"""Color palette for visualization (reference: detectron2/utils/colormap.py).
Generated procedurally instead of a baked table."""

from __future__ import annotations

import colorsys

import numpy as np


def colormap(rgb: bool = False, maximum: int = 255) -> np.ndarray:
    """74 distinct colors, shape (74, 3)."""
    n = 74
    colors = []
    for i in range(n):
        h = (i * 0.61803398875) % 1.0
        s = 0.65 + 0.35 * ((i * 7) % 3) / 2.0
        v = 0.75 + 0.25 * ((i * 5) % 2)
        colors.append(colorsys.hsv_to_rgb(h, s, v))
    arr = np.asarray(colors) * maximum
    if not rgb:
        arr = arr[:, ::-1]
    return arr


def random_color(rgb: bool = False, maximum: int = 255) -> np.ndarray:
    idx = np.random.randint(0, 74)
    return colormap(rgb, maximum)[idx]
