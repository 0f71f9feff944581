"""RoIAlign as vectorized bilinear gather (forward + autodiff backward).

Reference: detectron2/layers/roi_align.py:31 and the CUDA kernels in
`layers/csrc/ROIAlign/`. TPU re-design: instead of a hand-written
forward/backward kernel pair, the op is expressed as pure gathers +
arithmetic, so XLA differentiates it (the backward becomes scatter-adds) and
fuses the interpolation weights with the gather. Layout is NHWC.

Semantics implemented: ROIAlign **v2** (``aligned=True`` — half-pixel
correction, reference roi_align.py:44) and v1 (aligned=False).

Sampling ratio: a positive value is a static grid like the reference's.
``sampling_ratio=0`` reproduces the reference's **adaptive** semantics
(per-ROI grid ``ceil(roi_size/out)``, ROIAlign_cpu.cpp:181) exactly, with a
static graph: samples are laid out on a fixed ``ADAPTIVE_MAX_RATIO`` grid
and positions/averaging divisors are computed with the *dynamic* per-ROI
ratio, masking the unused slots. Exact for ROIs whose bin size is <=
ADAPTIVE_MAX_RATIO px (all FPN-assigned boxes, and C4 boxes up to
``ADAPTIVE_MAX_RATIO * stride * output_size`` px); larger ROIs fall back to
the capped grid. Costs ADAPTIVE_MAX_RATIO^2/4 more samples than ratio 2 on
the gather path, so the production TPU default stays a fixed ratio.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

# static sample-grid size backing the adaptive (sampling_ratio=0) mode
ADAPTIVE_MAX_RATIO = 4


def _axis_positions(p: int, s: int, bin_size: Array, origin: Array, ratio: Array | None):
    """Sample positions along one axis: (R, p*s) coords + validity mask.

    ``ratio`` None -> static grid (every slot live, within-bin offsets
    (k+0.5)/s). Otherwise ``ratio`` is the per-ROI adaptive grid count
    (R,) and slot k is live iff k < ratio, at offset (k+0.5)/ratio
    (ROIAlign_cpu.cpp:181 RoIAlignForward adaptive branch).
    """
    bins = jnp.arange(p, dtype=jnp.float32)[:, None]  # (p, 1)
    slots = jnp.arange(s, dtype=jnp.float32)[None, :]  # (1, s)
    if ratio is None:
        grid = (bins + (slots + 0.5) / s).reshape(-1)  # (p*s,)
        pos = origin[:, None] + grid[None, :] * bin_size[:, None]
        valid = jnp.ones(pos.shape, bool)
        return pos, valid
    rr = ratio.astype(jnp.float32)[:, None, None]  # (R, 1, 1)
    grid = bins[None] + (slots[None] + 0.5) / rr  # (R, p, s)
    pos = origin[:, None, None] + grid * bin_size[:, None, None]
    valid = jnp.broadcast_to(slots[None] < rr, pos.shape)
    return pos.reshape(pos.shape[0], -1), valid.reshape(pos.shape[0], -1)


def _roi_geometry(boxes: Array, ph: int, pw: int, spatial_scale, aligned: bool):
    offset = 0.5 if aligned else 0.0
    sc = jnp.asarray(spatial_scale, jnp.float32)
    if sc.ndim == 1:  # per-ROI scale (multilevel path)
        sc = sc[:, None]
    bx = boxes.astype(jnp.float32) * sc - offset
    x0, y0, x1, y1 = bx[:, 0], bx[:, 1], bx[:, 2], bx[:, 3]
    roi_w = x1 - x0
    roi_h = y1 - y0
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    return x0, y0, roi_w / pw, roi_h / ph


def _grids(boxes, ph, pw, s, spatial_scale, aligned, adaptive):
    """(ys, xs, yvalid, xvalid, count): coordinates, live masks, and the
    per-ROI averaging divisor."""
    x0, y0, bin_w, bin_h = _roi_geometry(boxes, ph, pw, spatial_scale, aligned)
    if adaptive:
        ry = jnp.clip(jnp.ceil(bin_h), 1, s).astype(jnp.int32)
        rx = jnp.clip(jnp.ceil(bin_w), 1, s).astype(jnp.int32)
        ys, yv = _axis_positions(ph, s, bin_h, y0, ry)
        xs, xv = _axis_positions(pw, s, bin_w, x0, rx)
        count = (ry * rx).astype(jnp.float32)
    else:
        ys, yv = _axis_positions(ph, s, bin_h, y0, None)
        xs, xv = _axis_positions(pw, s, bin_w, x0, None)
        count = jnp.full((boxes.shape[0],), float(s * s), jnp.float32)
    return ys, xs, yv, xv, count


def _sample_grid(boxes: Array, ph: int, pw: int, s: int, spatial_scale, aligned: bool):
    """Static-grid sample coordinates, (R, P*S) along each axis (the
    pre-adaptive interface, still used by wsl/ops.py MOIPool)."""
    ys, xs, _, _, _ = _grids(boxes, ph, pw, s, spatial_scale, aligned, False)
    return ys, xs


def _prep(coords: Array, size):
    """Bilinear corner index + fraction with the reference's boundary rules:
    samples outside [-1, size] produce zeros; coords in [-1, 0] snap to 0;
    coords >= size-1 clamp onto the last cell with frac 1.

    ``size`` may be a python int or a per-ROI (R, 1) array (multilevel path).
    """
    out_of_range = (coords < -1.0) | (coords > size)
    coords = jnp.clip(coords, 0.0)
    lo = jnp.floor(coords)
    frac = coords - lo
    lo = lo.astype(jnp.int32)
    hi_oob = lo >= size - 1
    lo = jnp.where(hi_oob, size - 2, lo)
    frac = jnp.where(hi_oob, 1.0, frac)
    lo = jnp.clip(lo, 0, jnp.maximum(size - 2, 0))
    return lo, frac, out_of_range


def _gather_interpolate(
    feat_flat: Array,  # (B*H*W, C) or (H*W, C)
    row_base: Array,  # (R,) int flat offset of each ROI's image (0 for single)
    ylo: Array,
    yfrac: Array,
    y_oob: Array,
    xlo: Array,
    xfrac: Array,
    x_oob: Array,
    w,  # int, or (R,) per-ROI row stride for the multilevel path
    r: int,
    ph: int,
    pw: int,
    s: int,
    y_live=None,  # (R, ph*s) adaptive live-slot masks (None = all live)
    x_live=None,
    count=None,  # (R,) averaging divisor (None = s*s)
):
    c = feat_flat.shape[-1]
    n = feat_flat.shape[0]
    if isinstance(w, (int, float)):
        w_arr = jnp.full((r,), int(w), dtype=jnp.int32)
    else:
        w_arr = w.astype(jnp.int32)
    w_b = w_arr[:, None, None]
    base = row_base[:, None, None] + ylo[:, :, None] * w_b + xlo[:, None, :]
    zero = y_oob[:, :, None] | x_oob[:, None, :]

    def gather(idx):
        return jnp.take(feat_flat, idx.reshape(-1), axis=0).reshape(
            r, ph * s, pw * s, c
        )

    v00 = gather(base)
    v01 = gather(base + 1)
    v10 = gather(base + w_b)
    v11 = gather(base + w_b + 1)

    # interpolate in the feature dtype (bf16 on the hot path) — avoids f32
    # promotion that would double the already-bandwidth-bound buffers
    dt = feat_flat.dtype
    wy = yfrac[:, :, None, None].astype(dt)
    wx = xfrac[:, None, :, None].astype(dt)
    one = jnp.asarray(1.0, dt)
    val = (
        v00 * (one - wy) * (one - wx)
        + v01 * (one - wy) * wx
        + v10 * wy * (one - wx)
        + v11 * wy * wx
    )
    dead = zero
    if y_live is not None:
        dead = dead | ~(y_live[:, :, None] & x_live[:, None, :])
    val = jnp.where(dead[..., None], jnp.asarray(0.0, dt), val)
    val = val.reshape(r, ph, s, pw, s, c)
    if count is None:
        return val.mean(axis=(2, 4))
    return val.sum(axis=(2, 4)) / count[:, None, None, None].astype(dt)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned"))
def roi_align(
    features: Array,
    boxes: Array,
    output_size: int | tuple,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> Array:
    """features: (H, W, C); boxes: (R, 4) XYXY in image coords -> (R, P, P, C)."""
    ph, pw = (output_size, output_size) if isinstance(output_size, int) else output_size
    adaptive = int(sampling_ratio) == 0
    s = ADAPTIVE_MAX_RATIO if adaptive else max(int(sampling_ratio), 1)
    h, w, c = features.shape
    r = boxes.shape[0]

    ys, xs, yv, xv, count = _grids(boxes, ph, pw, s, spatial_scale, aligned, adaptive)
    ylo, yfrac, y_oob = _prep(ys, h)
    xlo, xfrac, x_oob = _prep(xs, w)
    row_base = jnp.zeros((r,), dtype=jnp.int32)
    return _gather_interpolate(
        features.reshape(h * w, c), row_base, ylo, yfrac, y_oob, xlo, xfrac, x_oob, w, r, ph, pw, s,
        yv if adaptive else None, xv if adaptive else None, count if adaptive else None,
    )


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned"))
def roi_align_batched(
    features: Array,
    boxes: Array,
    batch_indices: Array,
    output_size: int | tuple,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> Array:
    """features: (B, H, W, C); boxes: (R, 4); batch_indices: (R,) int32.

    Static-shape analog of the reference's (batch_idx, x0, y0, x1, y1) ROI
    format. Boundary clamping is applied per image before the batch offset is
    added, so no sample ever bleeds into a neighboring image.
    """
    b, h, w, c = features.shape
    ph, pw = (output_size, output_size) if isinstance(output_size, int) else output_size
    adaptive = int(sampling_ratio) == 0
    s = ADAPTIVE_MAX_RATIO if adaptive else max(int(sampling_ratio), 1)
    r = boxes.shape[0]

    ys, xs, yv, xv, count = _grids(boxes, ph, pw, s, spatial_scale, aligned, adaptive)
    ylo, yfrac, y_oob = _prep(ys, h)
    xlo, xfrac, x_oob = _prep(xs, w)
    row_base = batch_indices.astype(jnp.int32) * (h * w)
    return _gather_interpolate(
        features.reshape(b * h * w, c), row_base, ylo, yfrac, y_oob, xlo, xfrac, x_oob, w, r, ph, pw, s,
        yv if adaptive else None, xv if adaptive else None, count if adaptive else None,
    )


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned"))
def roi_align_multilevel(
    features: tuple,  # tuple of (B, Hi, Wi, C) NHWC maps, fine -> coarse
    spatial_scales: tuple,  # per-level 1/stride
    boxes: Array,  # (R, 4) XYXY image coords
    batch_indices: Array,  # (R,) int32
    levels: Array,  # (R,) int32 level assignment per ROI
    output_size: int | tuple,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> Array:
    """Unified-pyramid ROIAlign: all levels are flattened into one
    (sum_i B*Hi*Wi, C) buffer and every ROI samples its assigned level via a
    per-ROI flat offset — one gather pass, no per-level branching. This is the
    TPU-native replacement for the reference ROIPooler's per-level index_put
    loop (detectron2/modeling/poolers.py:190-245).
    """
    ph, pw = (output_size, output_size) if isinstance(output_size, int) else output_size
    adaptive = int(sampling_ratio) == 0
    s = ADAPTIVE_MAX_RATIO if adaptive else max(int(sampling_ratio), 1)
    r = boxes.shape[0]
    c = features[0].shape[-1]
    b = features[0].shape[0]

    flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)

    level_starts = []
    acc = 0
    hs, ws = [], []
    for f in features:
        level_starts.append(acc)
        acc += f.shape[0] * f.shape[1] * f.shape[2]
        hs.append(f.shape[1])
        ws.append(f.shape[2])
    level_starts = jnp.asarray(level_starts, dtype=jnp.int32)
    hs = jnp.asarray(hs, dtype=jnp.int32)
    ws = jnp.asarray(ws, dtype=jnp.int32)
    scales = jnp.asarray(spatial_scales, dtype=jnp.float32)

    lvl = jnp.clip(levels.astype(jnp.int32), 0, len(features) - 1)
    roi_scale = scales[lvl]  # (R,)
    roi_h = hs[lvl]
    roi_w = ws[lvl]
    row_base = level_starts[lvl] + batch_indices.astype(jnp.int32) * roi_h * roi_w

    # sample grid with per-ROI scale
    ys, xs, yv, xv, count = _grids(boxes, ph, pw, s, roi_scale, aligned, adaptive)

    ylo, yfrac, y_oob = _prep(ys, roi_h[:, None])
    xlo, xfrac, x_oob = _prep(xs, roi_w[:, None])
    return _gather_interpolate(
        flat, row_base, ylo, yfrac, y_oob, xlo, xfrac, x_oob, roi_w, r, ph, pw, s,
        yv if adaptive else None, xv if adaptive else None, count if adaptive else None,
    )


class ROIAlign:
    """Module-style wrapper over :func:`roi_align_batched` (reference
    layers/roi_align.py:31 ``ROIAlign``). Rois use the reference's
    (batch_idx, x0, y0, x1, y1) layout."""

    def __init__(self, output_size, spatial_scale: float, sampling_ratio: int = 2, aligned: bool = True):
        self.output_size = output_size
        self.spatial_scale = float(spatial_scale)
        self.sampling_ratio = int(sampling_ratio)
        self.aligned = bool(aligned)

    def __call__(self, features: Array, rois: Array) -> Array:
        return roi_align_batched(
            features,
            rois[:, 1:5],
            rois[:, 0].astype(jnp.int32),
            self.output_size,
            self.spatial_scale,
            self.sampling_ratio,
            self.aligned,
        )

    def __repr__(self):
        return (
            f"ROIAlign(output_size={self.output_size}, spatial_scale={self.spatial_scale}, "
            f"sampling_ratio={self.sampling_ratio}, aligned={self.aligned})"
        )
