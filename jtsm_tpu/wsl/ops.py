"""WSL native-op equivalents in pure JAX.

The reference implements these as C++/CUDA kernels under
`projects/WSL/wsl/layers/csrc/`; here each is re-expressed as vectorized
JAX (SURVEY.md §7: "control-heavy -> prefer pure-JAX segment ops").

* ``moi_pool``      — MOIPool/{_cpu.cpp,_cuda.cu}: RoI max-pool where
                      activations outside the proposal's superpixel mask are
                      excluded; also returns the valid-sample fraction used
                      for mask-area normalization (roi_heads_jtsm.py:615-630).
* ``roi_loop_pool`` — ROILoopPool: pools ROI + inner frame + outer context
                      boxes (ContextLocNet).
* ``roi_label``     — ROILabel: score+IoU -> fg/bg labels & weights for
                      refinement supervision.
* ``pcl_losses``    — pcl_loss: proposal-cluster learning loss.
* ``crf_mean_field``— csrc/crf: dense-CRF mean-field refinement (Gaussian +
                      bilateral terms approximated with box filters).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.roi_align import _prep, _sample_grid
from ..structures.boxes import pairwise_iou

Array = jax.Array


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def moi_pool(
    features: Array,  # (H, W, C) single image feature map
    boxes: Array,  # (R, 4)
    superpixels: Array,  # (Hs, Ws) int32 superpixel id map (image res)
    oh_labels: Array,  # (R, S) bool membership of superpixel s in proposal r
    spatial_scale: float = 1.0,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> Tuple[Array, Array]:
    """Masked-out-of-interest ROI max pool.

    Returns (pooled (R, P, P, C), valid_frac (R, P, P)). Sampled formulation:
    the bin max is taken over ``sampling_ratio^2`` samples per bin (the
    reference maxes over every pixel; dense sampling converges to it).
    """
    p = output_size
    s = max(sampling_ratio, 1)
    h, w, c = features.shape
    r = boxes.shape[0]
    hs, ws = superpixels.shape

    ys, xs = _sample_grid(boxes, p, p, s, spatial_scale, aligned=True)  # (R, P*S)
    ylo, yfrac, y_oob = _prep(ys, h)
    xlo, xfrac, x_oob = _prep(xs, w)
    # nearest-neighbor feature sample (max-pool flavor like RoIPool)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w - 1)

    flat = features.reshape(h * w, c)
    idx = yi[:, :, None] * w + xi[:, None, :]
    vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(r, p * s, p * s, c)

    # superpixel membership at sample positions (sp map is image-res)
    sy = jnp.clip(jnp.round(ys / spatial_scale).astype(jnp.int32), 0, hs - 1)
    sx = jnp.clip(jnp.round(xs / spatial_scale).astype(jnp.int32), 0, ws - 1)
    sp_ids = superpixels[sy[:, :, None], sx[:, None, :]]  # (R, PS, PS)
    member = jnp.take_along_axis(
        oh_labels, sp_ids.reshape(r, -1), axis=1
    ).reshape(r, p * s, p * s)
    in_bounds = ~(y_oob[:, :, None] | x_oob[:, None, :])
    valid = member & in_bounds

    neg_inf = jnp.asarray(-1e30, vals.dtype)
    masked = jnp.where(valid[..., None], vals, neg_inf)
    masked = masked.reshape(r, p, s, p, s, c)
    pooled = masked.max(axis=(2, 4))
    valid_frac = valid.reshape(r, p, s, p, s).mean(axis=(2, 4))
    pooled = jnp.where(pooled <= neg_inf / 2, 0.0, pooled)
    return pooled, valid_frac


def frame_and_context_boxes(boxes: Array, scale_inner: float = 0.5, scale_outer: float = 1.8):
    """ContextLocNet rois: inner 'frame' box and outer 'context' box."""
    cx = (boxes[:, 0] + boxes[:, 2]) / 2
    cy = (boxes[:, 1] + boxes[:, 3]) / 2
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]

    def make(scale):
        return jnp.stack(
            [
                cx - w * scale / 2,
                cy - h * scale / 2,
                cx + w * scale / 2,
                cy + h * scale / 2,
            ],
            axis=1,
        )

    return make(scale_inner), make(scale_outer)


def roi_loop_pool(
    features: Array,  # (B, H, W, C)
    boxes: Array,  # (R, 4)
    batch_indices: Array,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> Array:
    """Reference ROILoopPool: returns concatenated [roi, frame, context]
    pooled features, (3R, P, P, C) in that block order."""
    from ..ops.roi_align import roi_align_batched

    inner, outer = frame_and_context_boxes(boxes)
    pooled_roi = roi_align_batched(
        features, boxes, batch_indices, output_size, spatial_scale, sampling_ratio
    )
    pooled_frame = roi_align_batched(
        features, outer, batch_indices, output_size, spatial_scale, sampling_ratio
    )
    # frame: outer box minus inner region — approximate by zeroing the center
    # bins (the reference masks the pooled interior)
    p = output_size
    yy = jnp.arange(p)
    interior = (
        (yy[:, None] >= p // 4) & (yy[:, None] < p - p // 4)
        & (yy[None, :] >= p // 4) & (yy[None, :] < p - p // 4)
    )
    pooled_frame = jnp.where(interior[None, :, :, None], 0.0, pooled_frame)
    pooled_context = roi_align_batched(
        features, outer, batch_indices, output_size, spatial_scale, sampling_ratio
    )
    return jnp.concatenate([pooled_roi, pooled_frame, pooled_context], axis=0)


def roi_label(
    scores: Array,  # (R,) mined source scores per proposal (e.g. branch k-1)
    ious: Array,  # (R, G) IoU of proposals against mined pgt boxes
    pgt_valid: Array,  # (G,)
    fg_threshold: float = 0.5,
    bg_threshold: float = 0.1,
) -> Dict[str, Array]:
    """Reference ROILabel: produce per-proposal fg/bg labels + weights from
    IoU with mined pseudo boxes. Returns dict with matched pgt index, label
    in {-1 ignore, 0 bg, 1 fg} and weight (score of matched pgt)."""
    ious = jnp.where(pgt_valid[None, :], ious, -1.0)
    best = jnp.max(ious, axis=1)
    arg = jnp.argmax(ious, axis=1)
    label = jnp.where(best >= fg_threshold, 1, jnp.where(best < bg_threshold, 0, -1))
    weight = jnp.where(label != 0, scores[arg] if scores.ndim else best, 1.0)
    return {"matched_idx": arg, "label": label, "weight": weight, "max_iou": best}


def pcl_losses(
    pcl_probs: Array,  # (R, K+1) proposal probs (bg last or first per conv.)
    labels: Array,  # (R,) cluster class labels; K = bg
    cls_loss_weights: Array,  # (R,)
    gt_assignment: Array,  # (R,) cluster id per proposal
    pc_probs: Array,  # (Cmax,) mean prob of each cluster for its class
    pc_labels: Array,  # (Cmax,)
    pc_count: Array,  # (Cmax,)
    img_cls_loss_weights: Array,  # (Cmax,)
    im_labels: Array,  # (K+1,)
    num_classes: int,
) -> Array:
    """Proposal-cluster-learning loss (reference csrc/pcl_loss): background
    proposals use per-proposal CE; fg proposals use their CLUSTER's averaged
    probability."""
    r = pcl_probs.shape[0]
    bg = labels == num_classes
    p_bg = jnp.take_along_axis(pcl_probs, labels[:, None], axis=1)[:, 0]
    loss_bg = -cls_loss_weights * jnp.log(jnp.clip(p_bg, 1e-8)) * bg

    cluster_p = pc_probs[gt_assignment]
    loss_fg_per_cluster = -img_cls_loss_weights * jnp.log(jnp.clip(pc_probs, 1e-8))
    valid_cluster = pc_count > 0
    loss_fg = jnp.sum(loss_fg_per_cluster * valid_cluster)
    return (jnp.sum(loss_bg) + loss_fg) / jnp.maximum(r, 1)


def crf_mean_field(
    unary: Array,  # (H, W, K) class probabilities
    image: Array,  # (H, W, 3) float
    num_iter: int = 5,
    pos_w: float = 3.0,
    pos_xy_std: float = 3.0,
    bi_w: float = 4.0,
    bi_xy_std: float = 49.0,
    bi_rgb_std: float = 5.0,
) -> Array:
    """Dense-CRF mean-field (reference csrc/crf/crf_cpu.cpp wrapping
    densecrf). TPU re-design: the Gaussian pairwise term becomes a separable
    blur; the bilateral term is approximated by edge-weighted blurs — an
    O(HWK) approximation of the permutohedral filtering, adequate for the
    mask-refinement role it plays in WSJDS."""

    def gaussian_blur(x, sigma):
        radius = max(int(2 * sigma), 1)
        coords = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
        kernel = jnp.exp(-0.5 * (coords / sigma) ** 2)
        kernel = kernel / kernel.sum()
        x = jax.vmap(
            lambda col: jnp.convolve(col, kernel, mode="same"), in_axes=1, out_axes=1
        )(x.reshape(x.shape[0], -1)).reshape(x.shape)
        xt = x.swapaxes(0, 1)
        xt = jax.vmap(
            lambda col: jnp.convolve(col, kernel, mode="same"), in_axes=1, out_axes=1
        )(xt.reshape(xt.shape[0], -1)).reshape(xt.shape)
        return xt.swapaxes(0, 1)

    # edge affinity from local color variation
    gx = jnp.diff(image, axis=1, prepend=image[:, :1])
    gy = jnp.diff(image, axis=0, prepend=image[:1])
    edge = jnp.exp(-(jnp.sum(gx**2 + gy**2, axis=-1)) / (2 * bi_rgb_std**2))

    q = unary
    log_unary = jnp.log(jnp.clip(unary, 1e-8))
    for _ in range(num_iter):
        msg_pos = gaussian_blur(q, pos_xy_std) - q
        msg_bi = (gaussian_blur(q * edge[..., None], bi_xy_std / 8) - q * edge[..., None])
        energy = log_unary + pos_w * msg_pos + bi_w * msg_bi
        q = jax.nn.softmax(energy, axis=-1)
    return q


def csc_constraint(x: Array, w: Array, polar: bool = True) -> Array:
    """Spatial-constraint multiply (reference wsl/layers/csc.py:102-140,
    ``_CSCConstraint``): keep only the positive (polar=True) or negated
    negative (polar=False) part of the CSC weight ``w`` and scale ``x`` by
    it. The weight is a constant in the backward pass (the reference's
    custom Function returns ``dX = dY * W_`` and no grad for ``W``), which
    in JAX is simply a ``stop_gradient`` on the clamped weight."""
    if polar:
        w_ = jnp.maximum(w, 0.0)
    else:
        w_ = -jnp.minimum(w, 0.0)
    return x * jax.lax.stop_gradient(w_)
