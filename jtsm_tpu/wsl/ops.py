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


def superpixel_membership_grid(
    superpixels: Array,  # (Hs, Ws) int32 id map (image res)
    oh_labels: Array,  # (R, S) bool membership of superpixel s in proposal r
    grid_stride: int,
) -> Array:
    """Per-proposal membership grid mask_g[r, gy, gx] = oh[r, sp_g[gy, gx]]
    at stride-g cell centers, computed as a one-hot segment matmul (bf16
    operands, f32 accumulate: each output is a single 0/1 product, so
    values are exactly 0.0 or 1.0). Keeps the whole membership path on the
    MXU instead of ~12-cycle/element XLA scalar gathers."""
    g = int(grid_stride)
    r, ns = oh_labels.shape
    off = g // 2
    sp_g = superpixels[off::g, off::g]  # (Hg, Wg) cell-center ids
    hg, wg = sp_g.shape
    seg_onehot = (
        sp_g.reshape(1, -1) == jnp.arange(ns, dtype=sp_g.dtype)[:, None]
    ).astype(jnp.bfloat16)  # (S, Hg*Wg)
    return jax.lax.dot(
        oh_labels.astype(jnp.bfloat16),
        seg_onehot,
        preferred_element_type=jnp.float32,
    ).reshape(r, hg, wg)


def sample_membership_grid(
    mask_g: Array,  # (R, Hg, Wg) 0/1 grid
    gy: Array,  # (R, K) grid row per y-sample
    gx: Array,  # (R, L) grid col per x-sample
    y_ok: Array = None,  # (R, K) bool in-bounds (rides as zeroed rows)
    x_ok: Array = None,  # (R, L)
) -> Array:
    """Separable per-sample lookup mask_g[r, gy_k, gx_l] -> (R, K, L) f32 as
    two one-hot batched matmuls (values exactly 0/1)."""
    hg, wg = mask_g.shape[1:]
    # pixels past the last cell center belong to the last cell (maps whose
    # size is not a multiple of g would otherwise index one cell too far
    # and silently drop those samples as all-zero one-hot rows)
    yb = jnp.clip(gy, 0, hg - 1)[:, :, None] == jnp.arange(hg)
    xb = jnp.clip(gx, 0, wg - 1)[:, :, None] == jnp.arange(wg)
    if y_ok is not None:
        yb = yb & y_ok[:, :, None]
    if x_ok is not None:
        xb = xb & x_ok[:, :, None]
    m1 = jnp.einsum(
        "rky,ryx->rkx",
        yb.astype(jnp.bfloat16),
        mask_g.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return jnp.einsum(
        "rkx,rlx->rkl",
        m1.astype(jnp.bfloat16),
        xb.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


@partial(
    jax.jit,
    static_argnames=(
        "output_size",
        "sampling_ratio",
        "sp_grid_stride",
        "nonneg_features",
    ),
)
def moi_pool(
    features: Array,  # (H, W, C) single image feature map
    boxes: Array,  # (R, 4)
    superpixels: Array,  # (Hs, Ws) int32 superpixel id map (image res)
    oh_labels: Array,  # (R, S) bool membership of superpixel s in proposal r
    spatial_scale: float = 1.0,
    output_size: int = 7,
    sampling_ratio: int = 2,
    sp_grid_stride: int = 4,
    nonneg_features: bool = False,
) -> Tuple[Array, Array]:
    """Masked-out-of-interest ROI max pool.

    Returns (pooled (R, P, P, C), valid_frac (R, P, P)). Sampled formulation:
    the bin max is taken over ``sampling_ratio^2`` samples per bin (the
    reference maxes over every pixel; dense sampling converges to it).

    ``sp_grid_stride`` trades membership-sampling resolution for speed: the
    superpixel map is sampled on a stride-g pixel grid (nearest cell center,
    so samples land within g/2 px of their exact position — negligible next
    to MCG superpixels, which are tens of pixels across). With g > 1 the
    whole membership path is matmuls: a one-hot segment matrix turns
    ``oh_labels`` into a per-ROI membership grid in one MXU contraction, and
    per-sample lookups become separable one-hot batched matmuls. The exact
    per-pixel formulation (g <= 1) costs ~12 cycles/element in XLA scalar
    gathers — 38 ms of the flagship JTSM step vs ~3 ms for the matmul form.
    """
    p = output_size
    s = max(sampling_ratio, 1)
    h, w, c = features.shape
    r = boxes.shape[0]
    hs, ws = superpixels.shape
    g = max(int(sp_grid_stride), 1)

    ys, xs = _sample_grid(boxes, p, p, s, spatial_scale, aligned=True)  # (R, P*S)
    _, _, y_oob = _prep(ys, h)
    _, _, x_oob = _prep(xs, w)
    # nearest-neighbor feature sample (max-pool flavor like RoIPool)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w - 1)

    if g > 1:
        mask_g = superpixel_membership_grid(superpixels, oh_labels, g)
        # exact sample pixel, then the stride-g cell containing it: on maps
        # constant over g-aligned blocks this is bit-identical to the exact
        # per-pixel path; otherwise it reads the id at the cell center
        sgy = jnp.clip(jnp.round(ys / spatial_scale).astype(jnp.int32), 0, hs - 1) // g
        sgx = jnp.clip(jnp.round(xs / spatial_scale).astype(jnp.int32), 0, ws - 1) // g
        member_all = sample_membership_grid(
            mask_g, sgy, sgx, ~y_oob, ~x_oob
        )  # (R, K, K) exact 0/1; consumed arithmetically below (a pred
        # select here would materialize the (R, P, P, C) bool broadcast)
    else:
        # exact per-pixel membership (scalar gathers; slow on TPU)
        sy = jnp.clip(jnp.round(ys / spatial_scale).astype(jnp.int32), 0, hs - 1)
        sx = jnp.clip(jnp.round(xs / spatial_scale).astype(jnp.int32), 0, ws - 1)
        cols = []
        for jx in range(s):
            sx_j = sx[:, jx::s]
            sp_ids = superpixels[sy[:, :, None], sx_j[:, None, :]]  # (R, K, P)
            member = jnp.take_along_axis(
                oh_labels, sp_ids.reshape(r, -1), axis=1
            ).reshape(r, p * s, p)
            cols.append(member)
        valid_bool = jnp.stack(cols, axis=-1).reshape(r, p * s, p * s) & ~(
            y_oob[:, :, None] | x_oob[:, None, :]
        )
        member_all = valid_bool.astype(jnp.float32)

    flat = features.reshape(h * w, c)
    neg_inf = jnp.asarray(-1e30, features.dtype)
    # one appended zero row: invalid samples gather it directly (below)
    flat_z = jnp.concatenate([flat, jnp.zeros((1, c), flat.dtype)], axis=0)

    # one feature gather per (jy, jx) sample offset instead of a single
    # (R, P*S, P*S, C) gather: the monolithic form forced a 3.2 GB layout
    # reshape + an unfused reduce-max (~30 ms of the JTSM step at batch 4);
    # the per-offset form keeps each (R, P, P, C) block in its consumer's
    # layout and lets XLA fuse the masking + running max. Max/mean are
    # reassociations of the same floats, so the result is bit-identical.
    pooled = None
    for jy in range(s):
        yi_j = yi[:, jy::s]
        for jx in range(s):
            xi_j = xi[:, jx::s]
            idx = yi_j[:, :, None] * w + xi_j[:, None, :]  # (R, P, P)
            m_bool = member_all[:, jy::s, jx::s] >= 0.5  # exact 0/1 floats
            if nonneg_features:
                # features are known >= 0 (ReLU-terminated backbone), so
                # masking-to-zero is exactly the masked max: invalid samples
                # can never win, and bins with no valid sample pool to 0 —
                # the same value the additive form's final cleanup assigns.
                # The mask is applied to the GATHER INDEX (invalid samples
                # read the appended zero row) instead of multiplying the
                # gathered values: the (R, P, P, C) 0/1 broadcast multiply
                # made XLA materialize 3 x 400 MB operands in the fc operand
                # layout (~16 ms/step at batch 4); the index select is a
                # (R, P, P) int op fused into the gather
                idx_m = jnp.where(m_bool, idx, h * w)
                vals = jnp.take(flat_z, idx_m.reshape(-1), axis=0).reshape(
                    r, p, p, c
                )
                masked = vals
            else:
                # exact for arbitrary sign: member is exactly 0/1, so
                # invalid samples get vals - 1e30 and valid samples are
                # untouched (a pred-dtype jnp.where here makes XLA
                # materialize the (R, P, P, C) bool broadcast)
                vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(r, p, p, c)
                m = m_bool.astype(vals.dtype)[..., None]
                masked = vals + (m - 1.0) * (-neg_inf)
            pooled = masked if pooled is None else jnp.maximum(pooled, masked)
    valid_frac = member_all.reshape(r, p, s, p, s).mean(axis=(2, 4))
    if not nonneg_features:
        pooled = jnp.where(pooled <= neg_inf / 2, 0.0, pooled)
    return pooled, valid_frac


def roi_loop_pool(
    features: Array,  # (B, H, W, C)
    boxes: Array,  # (R, 4) XYXY in image coordinates
    batch_indices: Array,  # (R,)
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,  # unused (RoIPool semantics); kept for API parity
    context_ratio: float = 1.8,
) -> Array:
    """Reference-exact ROILoopPool (csrc/ROILoopPool/ROILoopPool_cuda.cu:10
    ``RoILoopPoolForward``, context_ratio 1.8 at :309): RoIPool-style integer
    max pooling of three regions per roi, concatenated in block order
    [roi, frame, context] -> (3R, P, P, C):

    * roi:     fixed-grid max over the roi windows;
    * frame:   the same roi windows EXCLUDING pixels strictly inside the
               1/context_ratio-shrunk inner box;
    * context: windows over the context_ratio-grown outer box (clamped to the
               image) EXCLUDING pixels strictly inside the roi.

    The kernel floors empty/negative maxima at 0 (it assumes nonneg inputs)."""
    p = output_size
    bimg, h, w, c = features.shape
    scale = float(spatial_scale)
    cr = float(context_ratio)

    def rnd(x):  # C round() — coords here can be negative after clamping? no:
        return jnp.floor(x + 0.5).astype(jnp.int32)

    rows = jnp.arange(h)
    cols = jnp.arange(w)
    phs = jnp.arange(p, dtype=jnp.float32)

    def windows(x1, y1, x2, y2):
        """Per-bin fixed-grid window membership (keep_h (H, P), keep_w (W, P))
        with the kernel's floor/ceil overlap + clamping."""
        rw = jnp.maximum(x2 - x1 + 1, 1).astype(jnp.float32)
        rh = jnp.maximum(y2 - y1 + 1, 1).astype(jnp.float32)
        bh = rh / p
        bw = rw / p
        hstart = jnp.clip(jnp.floor(phs * bh).astype(jnp.int32) + y1, 0, h)
        hend = jnp.clip(jnp.ceil((phs + 1) * bh).astype(jnp.int32) + y1, 0, h)
        wstart = jnp.clip(jnp.floor(phs * bw).astype(jnp.int32) + x1, 0, w)
        wend = jnp.clip(jnp.ceil((phs + 1) * bw).astype(jnp.int32) + x1, 0, w)
        keep_h = (rows[:, None] >= hstart[None]) & (rows[:, None] < hend[None])
        keep_w = (cols[:, None] >= wstart[None]) & (cols[:, None] < wend[None])
        return keep_h, keep_w

    def pool(feat, keep_h, keep_w, excl):
        """(P, P, C) max over the windows of pixels NOT excluded, floored at 0."""
        out = []
        for ph in range(p):
            masked = jnp.where(
                (keep_h[:, ph][:, None] & ~excl)[:, :, None], feat, -jnp.inf
            )
            colmax = jnp.max(masked, axis=0)  # (W, C)
            row = [
                jnp.maximum(
                    jnp.max(
                        jnp.where(keep_w[:, pw][:, None], colmax, -jnp.inf), axis=0
                    ),
                    0.0,
                )
                for pw in range(p)
            ]
            out.append(jnp.stack(row))
        return jnp.stack(out)

    def one(box, bi):
        feat = features[bi]
        x1 = rnd(box[0] * scale)
        y1 = rnd(box[1] * scale)
        x2 = rnd(box[2] * scale)
        y2 = rnd(box[3] * scale)

        bw_img = box[2] - box[0]
        bh_img = box[3] - box[1]
        in_res_w = (bw_img - bw_img / cr) / 2.0
        in_res_h = (bh_img - bh_img / cr) / 2.0
        out_res_w = (bw_img * cr - bw_img) / 2.0
        out_res_h = (bh_img * cr - bh_img) / 2.0
        img_w = w / scale
        img_h = h / scale
        x1_in = rnd(jnp.clip(box[0] + in_res_w, 0.0, img_w) * scale)
        y1_in = rnd(jnp.clip(box[1] + in_res_h, 0.0, img_h) * scale)
        x2_in = rnd(jnp.clip(box[2] - in_res_w, 0.0, img_w) * scale)
        y2_in = rnd(jnp.clip(box[3] - in_res_h, 0.0, img_h) * scale)
        x1_out = rnd(jnp.clip(box[0] - out_res_w, 0.0, img_w) * scale)
        y1_out = rnd(jnp.clip(box[1] - out_res_h, 0.0, img_h) * scale)
        x2_out = rnd(jnp.clip(box[2] + out_res_w, 0.0, img_w) * scale)
        y2_out = rnd(jnp.clip(box[3] + out_res_h, 0.0, img_h) * scale)

        no_excl = jnp.zeros((h, w), bool)
        inside_inner = (
            ((rows > y1_in) & (rows < y2_in))[:, None]
            & ((cols > x1_in) & (cols < x2_in))[None, :]
        )
        inside_roi = (
            ((rows > y1) & (rows < y2))[:, None]
            & ((cols > x1) & (cols < x2))[None, :]
        )

        kh, kw = windows(x1, y1, x2, y2)
        roi_out = pool(feat, kh, kw, no_excl)
        frame_out = pool(feat, kh, kw, inside_inner)
        kho, kwo = windows(x1_out, y1_out, x2_out, y2_out)
        ctx_out = pool(feat, kho, kwo, inside_roi)
        return roi_out, frame_out, ctx_out

    roi_o, frame_o, ctx_o = jax.vmap(one)(boxes, batch_indices)
    return jnp.concatenate([roi_o, frame_o, ctx_o], axis=0)


def roi_label(
    scores: Array,  # (R, C) proposal class scores S
    ious: Array,  # (R, R) proposal-vs-proposal IoU matrix U
    image_labels: Array,  # (C,) multi-hot L
    class_weights: Array,  # (C,) per-class weights CW
    fg_threshold: float = 0.5,
    bg_threshold_hi: float = 0.5,
    bg_threshold_lo: float = -1.0,
    top_k: int = 1,
) -> Dict[str, Array]:
    """Reference ROILabel (csrc/ROILabel/ROILabel_cpu.cpp): mine ``top_k``
    highest-scoring proposals per present class with GLOBAL exclusion (a
    proposal mined for an earlier class cannot be re-mined), then label every
    proposal by its best-IoU mined proposal: the mined class if IoU >=
    fg_threshold, background (= C) if bg_threshold_lo <= IoU <
    bg_threshold_hi, otherwise keep the class with weight 0 (ignore). The
    weight is ``class_weights[mined class]``.

    The reference's random fg/bg subsampling caps (num_pos_/num_neg_) are
    ignored (treated as unbounded), which makes the op deterministic; the
    parity fixtures are recorded with unbounded caps.
    """
    r, c = scores.shape
    present = image_labels > 0

    # sequential per-(class, k) mining with global exclusion
    def mine_class(ci, carry):
        mined_idx, mined_cls, mined_ok, taken = carry

        def mine_k(k, inner):
            mined_idx, mined_cls, mined_ok, taken = inner
            col = jnp.where(taken, -jnp.inf, scores[:, ci])
            idx = jnp.argmax(col)
            ok = present[ci] & jnp.isfinite(col[idx])
            slot = ci * top_k + k
            mined_idx = mined_idx.at[slot].set(jnp.where(ok, idx, -1))
            mined_cls = mined_cls.at[slot].set(ci)
            mined_ok = mined_ok.at[slot].set(ok)
            taken = taken.at[idx].set(taken[idx] | ok)
            return mined_idx, mined_cls, mined_ok, taken

        return jax.lax.fori_loop(0, top_k, mine_k, (mined_idx, mined_cls, mined_ok, taken))

    g = c * top_k
    mined_idx, mined_cls, mined_ok, _ = jax.lax.fori_loop(
        0,
        c,
        mine_class,
        (
            jnp.full((g,), -1, jnp.int32),
            jnp.zeros((g,), jnp.int32),
            jnp.zeros((g,), bool),
            jnp.zeros((r,), bool),
        ),
    )

    iou_to_mined = ious[:, jnp.clip(mined_idx, 0)]  # (R, G)
    iou_to_mined = jnp.where(mined_ok[None, :], iou_to_mined, -jnp.inf)
    best = jnp.max(iou_to_mined, axis=1)
    arg = jnp.argmax(iou_to_mined, axis=1)
    assign_c = mined_cls[arg]
    fg = best >= fg_threshold
    bg = (~fg) & (best >= bg_threshold_lo) & (best < bg_threshold_hi)
    label = jnp.where(fg, assign_c, jnp.where(bg, c, assign_c))
    weight = jnp.where(fg | bg, class_weights[assign_c], 0.0)
    return {
        "label": label,
        "weight": weight,
        "matched_idx": mined_idx[arg],
        "max_iou": best,
        "mined_idx": mined_idx,
        "mined_ok": mined_ok,
    }


def pcl_losses(
    pcl_probs: Array,  # (R, 1+C) proposal probs, BACKGROUND FIRST (channel 0)
    labels: Array,  # (R,) cluster class labels in [0, C]; 0 = background
    cls_loss_weights: Array,  # (R,) score of the assigned cluster (0 = ignore)
    gt_assignment: Array,  # (R,) cluster id per proposal (-1 for bg)
    pc_labels: Array,  # (G,) cluster class (1-indexed)
    pc_count: Array,  # (G,) member count per cluster
    img_cls_loss_weights: Array,  # (G,) sum of member weights per cluster
    im_labels: Array,  # (1+C,) with im_labels[0] = 1 (bg always present)
) -> Array:
    """Proposal-cluster-learning loss, exactly the reference
    csrc/pcl_loss/pcl_loss_cpu.cpp forward (normalized by R as in
    wsl/layers/pcl_loss.py:51): background proposals use per-proposal CE on
    channel 0; each CLUSTER contributes -img_w * log(mean member prob at its
    class). Differentiable in JAX — autodiff reproduces the reference's
    hand-written backward (parity-tested against it).
    """
    r = pcl_probs.shape[0]
    eps = 1e-6
    bg = (labels == 0) & (im_labels[0] != 0)
    p_bg = jnp.clip(pcl_probs[:, 0], eps)
    loss_bg = jnp.sum(-cls_loss_weights * jnp.log(p_bg) * bg)

    # mean member prob per cluster at the cluster's class, via segment sums
    g = pc_labels.shape[0]
    member = gt_assignment >= 0
    seg = jnp.where(member, gt_assignment, g)  # overflow row for bg
    cols = jnp.clip(pc_labels, 0, pcl_probs.shape[1] - 1)
    p_at_cls = pcl_probs[:, cols]  # (R, G): every roi's prob at each cluster's class
    onehot = (seg[:, None] == jnp.arange(g)[None, :]).astype(pcl_probs.dtype)
    pc_probs = jnp.sum(p_at_cls * onehot, axis=0) / jnp.maximum(pc_count, 1)

    cluster_present = (pc_count > 0) & (im_labels[jnp.clip(pc_labels, 0)] != 0) & (
        pc_labels > 0
    )
    loss_fg = jnp.sum(
        jnp.where(
            cluster_present,
            -img_cls_loss_weights * jnp.log(jnp.clip(pc_probs, eps)),
            0.0,
        )
    )
    return (loss_bg + loss_fg) / jnp.maximum(r, 1)


def crf_mean_field(
    unary: Array,  # (H, W, K) class probabilities
    image: Array,  # (H, W, 3) float
    num_iter: int = 5,
    pos_w: float = 3.0,
    pos_xy_std: float = 3.0,
    bi_w: float = 4.0,
    bi_xy_std: float = 49.0,
    bi_rgb_std: float = 5.0,
    num_bins: int = 16,
) -> Array:
    """Dense-CRF mean-field (reference csrc/crf/crf_cpu.cpp wrapping
    densecrf; Potts compatibility). TPU re-design of the permutohedral
    filtering:

    * the Gaussian (smoothness) kernel is an exact separable blur,
    * the bilateral kernel is a luminance bilateral grid — probabilities
      are splatted into ``num_bins`` intensity bins, each bin slice gets
      the spatial blur, bins are mixed with the range kernel, and pixels
      slice their own bin. Color distance is thereby approximated by
      luminance distance (quantized to the bin width).

    Both messages are normalized convolutions with the self term removed
    (sum_{j != i} k(i,j) Q_j / sum_{j != i} k(i,j)), matching the exact
    mean-field update; see tests/test_wsl_crf_reference.py for the
    brute-force dense-CRF comparison."""
    h, w, k = unary.shape

    def kernel1d(sigma):
        radius = max(int(2 * sigma), 1)
        coords = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
        kern = jnp.exp(-0.5 * (coords / sigma) ** 2)
        return kern / kern.sum()

    def band(kern, n):
        # (n, n) banded Toeplitz blur matrix: rows near the border sum to
        # < 1 (zero padding), matching the border-aware normalizers below
        radius = kern.shape[0] // 2
        offs = jnp.arange(n)[None, :] - jnp.arange(n)[:, None] + radius
        return jnp.where(
            (offs >= 0) & (offs < kern.shape[0]),
            kern[jnp.clip(offs, 0, kern.shape[0] - 1)],
            0.0,
        )

    def make_blur(sigma):
        kern = kernel1d(sigma)
        by, bx = band(kern, h), band(kern, w)
        center = kern[kern.shape[0] // 2] ** 2  # 2-D self weight

        def blur(x):  # (H, W, C) -> separable blur as two band matmuls
            x = jnp.einsum("ij,jwc->iwc", by, x)
            return jnp.einsum("ij,hjc->hic", bx, x)

        return blur, center

    blur_pos2d, c_pos = make_blur(pos_xy_std)
    blur_bi2d, c_bi = make_blur(bi_xy_std)

    # smoothness-kernel normalizer (border-aware)
    den_pos = blur_pos2d(jnp.ones((h, w, 1), jnp.float32)) - c_pos

    # luminance bilateral grid setup
    lum = image.astype(jnp.float32).mean(-1)
    lo, hi = lum.min(), lum.max()
    scale = (num_bins - 1) / jnp.maximum(hi - lo, 1e-6)
    z = jnp.clip(jnp.round((lum - lo) * scale), 0, num_bins - 1).astype(jnp.int32)
    onehot = (z[..., None] == jnp.arange(num_bins)).astype(jnp.float32)  # (H,W,B)
    # range kernel between bins, in intensity units
    bin_width = jnp.maximum(hi - lo, 1e-6) / (num_bins - 1)
    d = (jnp.arange(num_bins)[:, None] - jnp.arange(num_bins)[None, :]) * bin_width
    g_range = jnp.exp(-0.5 * (d / bi_rgb_std) ** 2)  # (B, B); diag = 1

    def bilateral(x):
        # x (H, W, C): splat -> spatial blur per bin -> bin mix -> slice
        grid = onehot[..., None] * x[..., None, :]  # (H, W, B, C)
        grid = blur_bi2d(grid.reshape(h, w, -1)).reshape(h, w, num_bins, -1)
        grid = jnp.einsum("bc,hwcx->hwbx", g_range, grid)
        return jnp.einsum("hwb,hwbx->hwx", onehot, grid)

    den_bi = bilateral(jnp.ones((h, w, 1), jnp.float32)) - c_bi

    q = unary.astype(jnp.float32)
    log_unary = jnp.log(jnp.clip(q, 1e-8))
    eps = 1e-6
    for _ in range(num_iter):
        msg_pos = (blur_pos2d(q) - c_pos * q) / jnp.maximum(den_pos, eps)
        msg_bi = (bilateral(q) - c_bi * q) / jnp.maximum(den_bi, eps)
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


def moi_pool_exact(
    features: Array,  # (H, W, C) single-image feature map
    boxes: Array,  # (R, 4) XYXY in image coordinates
    superpixels: Array,  # (Hs, Ws) int32 superpixel id map (image res)
    oh_labels: Array,  # (R, S) bool membership
    spatial_scale: float = 1.0,
    output_size: int = 7,
) -> Tuple[Array, Array]:
    """Reference-exact MOIPool forward (csrc/MOIPool/MOIPool_cuda.cu:10
    ``MoIPoolForward``): pooling bins are laid over the RANKS of the
    member pixels — per column, a pixel's row-rank among that column's
    member rows decides its height bin (t_roi_height/P*ph <= t_h <=
    t_roi_height/P*(ph+1)); analogously per row for width — so the masked
    region is compacted before binning. Bins whose FIXED spatial window is
    empty (the kernel's is_empty guard) and bins with no member pixel
    output 0 with validity False (argmax -1).

    Returns (pooled (R, P, P, C), valid (R, P, P) bool). This is the
    fidelity-exact (but gather-heavy) formulation; ``moi_pool`` is the
    TPU-fast fixed-grid variant used by default (WSL.MOI_POOL_EXACT
    selects this one)."""
    p = output_size
    h, w, c = features.shape
    hs, ws = superpixels.shape
    scale = float(spatial_scale)

    rows = jnp.arange(h)
    cols = jnp.arange(w)
    # image-res coordinates of each feature pixel (kernel: h / spatial_scale
    # with C float->int truncation)
    img_y = jnp.clip(jnp.floor(rows / scale).astype(jnp.int32), 0, hs - 1)
    img_x = jnp.clip(jnp.floor(cols / scale).astype(jnp.int32), 0, ws - 1)
    sp_feat = superpixels[img_y][:, img_x]  # (H, W) superpixel id per pixel

    def rnd(x):  # C round() on nonnegative coords
        return jnp.floor(x + 0.5).astype(jnp.int32)

    phs = jnp.arange(p, dtype=jnp.float32)

    def one(box, oh_r):
        x1 = rnd(box[0] * scale)
        y1 = rnd(box[1] * scale)
        x2 = rnd(box[2] * scale)
        y2 = rnd(box[3] * scale)
        inroi = (
            ((rows >= y1) & (rows < y2))[:, None]
            & ((cols >= x1) & (cols < x2))[None, :]
        )
        member = oh_r[sp_feat] & inroi  # (H, W)

        t_h = jnp.cumsum(member, axis=0).astype(jnp.float32)  # (H, W) rank
        T_h = member.sum(axis=0).astype(jnp.float32)  # (W,)
        t_w = jnp.cumsum(member, axis=1).astype(jnp.float32)
        T_w = member.sum(axis=1).astype(jnp.float32)

        # (H, W, P): row-rank falls in height-bin ph
        lo_h = T_h[None, :, None] / p * phs[None, None, :]
        hi_h = T_h[None, :, None] / p * (phs[None, None, :] + 1.0)
        keep_h = (lo_h <= t_h[:, :, None]) & (t_h[:, :, None] <= hi_h)
        lo_w = T_w[:, None, None] / p * phs[None, None, :]
        hi_w = T_w[:, None, None] / p * (phs[None, None, :] + 1.0)
        keep_w = (lo_w <= t_w[:, :, None]) & (t_w[:, :, None] <= hi_w)

        # the kernel's fixed-grid emptiness guard (MoIPoolForward :39-61)
        roi_w = jnp.maximum(x2 - x1 + 1, 1).astype(jnp.float32)
        roi_h = jnp.maximum(y2 - y1 + 1, 1).astype(jnp.float32)
        bh = roi_h / p
        bw = roi_w / p
        hstart = jnp.clip(jnp.floor(phs * bh).astype(jnp.int32) + y1, 0, h)
        hend = jnp.clip(jnp.ceil((phs + 1) * bh).astype(jnp.int32) + y1, 0, h)
        wstart = jnp.clip(jnp.floor(phs * bw).astype(jnp.int32) + x1, 0, w)
        wend = jnp.clip(jnp.ceil((phs + 1) * bw).astype(jnp.int32) + x1, 0, w)
        nonempty_fixed = (hend > hstart)[:, None] & (wend > wstart)[None, :]

        out = jnp.zeros((p, p, c), features.dtype)
        valid = jnp.zeros((p, p), bool)
        for ph in range(p):
            for pw in range(p):
                k2 = member & keep_h[:, :, ph] & keep_w[:, :, pw]
                any_k = jnp.any(k2) & nonempty_fixed[ph, pw]
                v = jnp.max(
                    jnp.where(k2[:, :, None], features, -jnp.inf), axis=(0, 1)
                )
                out = out.at[ph, pw].set(jnp.where(any_k, v, 0.0))
                valid = valid.at[ph, pw].set(any_k)
        return out, valid

    return jax.vmap(one)(boxes, oh_labels)


def roi_pool(
    features: Array,  # (H, W, C) single-image feature map
    boxes: Array,  # (R, 4) XYXY in image coordinates
    spatial_scale: float = 1.0,
    output_size: int = 7,
) -> Tuple[Array, Array]:
    """Reference-exact plain RoIPool (torchvision semantics; the reference's
    MOIPool CPU kernel — csrc/MOIPool/MOIPool_cpu.cpp ``RoIPoolForward`` —
    and the POOLER_TYPE "ROIPool" of the OICR/WSDDN configs): integer
    rounded roi window, fixed floor/ceil overlapping bins, hard max, empty
    bins -> 0 with validity False (argmax -1).

    Returns (pooled (R, P, P, C), valid (R, P, P) bool). Pinned against the
    compiled reference CPU kernel in tests/test_wsl_model_parity.py."""
    p = output_size
    h, w, c = features.shape
    scale = float(spatial_scale)

    def rnd(x):  # C round() on nonnegative coords
        return jnp.floor(x + 0.5).astype(jnp.int32)

    rows = jnp.arange(h)
    cols = jnp.arange(w)
    phs = jnp.arange(p, dtype=jnp.float32)

    def one(box):
        x1 = rnd(box[0] * scale)
        y1 = rnd(box[1] * scale)
        x2 = rnd(box[2] * scale)
        y2 = rnd(box[3] * scale)
        roi_w = jnp.maximum(x2 - x1 + 1, 1).astype(jnp.float32)
        roi_h = jnp.maximum(y2 - y1 + 1, 1).astype(jnp.float32)
        bh = roi_h / p
        bw = roi_w / p
        hstart = jnp.clip(jnp.floor(phs * bh).astype(jnp.int32) + y1, 0, h)
        hend = jnp.clip(jnp.ceil((phs + 1) * bh).astype(jnp.int32) + y1, 0, h)
        wstart = jnp.clip(jnp.floor(phs * bw).astype(jnp.int32) + x1, 0, w)
        wend = jnp.clip(jnp.ceil((phs + 1) * bw).astype(jnp.int32) + x1, 0, w)
        keep_h = (rows[:, None] >= hstart[None]) & (rows[:, None] < hend[None])
        keep_w = (cols[:, None] >= wstart[None]) & (cols[:, None] < wend[None])
        # two-stage masked max: rows -> (P, W, C), then cols -> (P, P, C)
        colmax = jnp.max(
            jnp.where(keep_h.T[:, :, None, None], features[None], -jnp.inf),
            axis=1,
        )  # (P, W, C)
        out = jnp.max(
            jnp.where(keep_w.T[None, :, :, None], colmax[:, None], -jnp.inf),
            axis=2,
        )  # (P, P, C)
        valid = (hend > hstart)[:, None] & (wend > wstart)[None, :]
        return jnp.where(valid[:, :, None], out, 0.0), valid

    return jax.vmap(one)(boxes)


# ---------------------------------------------------------------------------
# Reference wsl/layers/__init__.py public names. ``crf``/``pcl_loss`` are
# direct aliases; ``csc``/``roi_merge``/``compute_cpg`` live in
# modeling.wsod_zoo (they need model machinery) and resolve lazily to avoid
# a circular import.
# ---------------------------------------------------------------------------

crf = crf_mean_field
pcl_loss = pcl_losses


def __getattr__(name):
    if name in ("csc", "csc_full", "roi_merge", "roi_merge_lambda", "compute_cpg"):
        from .modeling import wsod_zoo

        return getattr(wsod_zoo, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
