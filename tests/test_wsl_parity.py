"""Golden-output parity for the condensed WSL native ops.

Fixtures in ``fixtures/wsl_ref_goldens.npz`` were recorded by compiling the
REFERENCE CPU ops (projects/WSL/wsl/layers/csrc/{ROIMerge,ROILabel,pcl_loss})
as a torch extension and running them on the fixed inputs stored alongside
the outputs (see the inputs saved in the same archive). The JAX
re-expressions must reproduce them exactly (float tolerance).

Not golden-testable here and why:
* MOIPool / ROILoopPool — the reference's CPU builds are plain RoIPool
  (the superpixel masking / loop-box logic lives only in the .cu kernels),
  so no authoritative CPU golden exists; masking semantics are covered by
  a structural test in test_wsl.py::test_moi_pool_masking instead.
* dense CRF — csrc/crf depends on the external densecrf library, which is
  an empty (un-vendored) submodule in the reference checkout; pinned against
  a brute-force O((HW)^2) dense-CRF oracle in test_wsl_crf_reference.py
  instead.
* CSC — csrc/csc is CUDA-only (no CPU implementation), so no recorded
  golden exists either; ``test_csc_parity`` below pins the JAX op against a
  line-by-line float32 numpy transcription of ``csc_forward_cuda``
  (csc_cuda.cu:352) on random inputs instead.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jtsm_tpu.wsl.modeling.wsod_zoo import roi_merge, roi_merge_lambda
from jtsm_tpu.wsl.ops import pcl_losses, roi_label

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "wsl_ref_goldens.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(FIX)


def test_roi_merge_forward_parity(g):
    lam = roi_merge_lambda(
        jnp.asarray(float(g["rm_cur_iter"])),
        float(g["rm_max_epoch"]),
        float(g["rm_size_epoch"]),
    )
    m = roi_merge(
        jnp.asarray(g["rm_S"]),
        jnp.asarray(g["rm_J"]),
        jnp.asarray(g["rm_C"]),
        jnp.asarray(g["rm_D"]),
        lam,
    )
    ref_mc, ref_md = g["rm_MC"], g["rm_MD"]
    num_id = int(m["num_id"])
    assert num_id == ref_mc.shape[0]
    np.testing.assert_array_equal(np.asarray(m["ids"]), g["rm_I"])
    np.testing.assert_array_equal(
        np.asarray(m["counts"])[:num_id].astype(np.int32), g["rm_IC"][:num_id]
    )
    np.testing.assert_allclose(
        np.asarray(m["merged_cls"])[:num_id], ref_mc, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m["merged_det"])[:num_id], ref_md, rtol=1e-5, atol=1e-6
    )


def test_roi_merge_backward_parity(g):
    """Gradient w.r.t. the cls scores matches the reference hand-written
    backward (ROIMerge_backward_cpu: dC[n] = GMC[id(n)] / count)."""
    lam = roi_merge_lambda(
        jnp.asarray(float(g["rm_cur_iter"])),
        float(g["rm_max_epoch"]),
        float(g["rm_size_epoch"]),
    )

    def f(c):
        m = roi_merge(
            jnp.asarray(g["rm_S"]), jnp.asarray(g["rm_J"]), c, jnp.asarray(g["rm_D"]), lam
        )
        # upstream grad of ones over the first num_id rows == reference GMC=1
        return jnp.sum(m["merged_cls"] * m["row_valid"][:, None])

    gc = jax.grad(f)(jnp.asarray(g["rm_C"]))
    np.testing.assert_allclose(np.asarray(gc), g["rm_GC"], rtol=1e-5, atol=1e-6)


def test_pcl_loss_forward_parity(g):
    loss = pcl_losses(
        jnp.asarray(g["pcl_probs"]),
        jnp.asarray(g["pcl_labels"]).astype(jnp.int32),
        jnp.asarray(g["pcl_w"]),
        jnp.asarray(g["pcl_assign"]).astype(jnp.int32),
        jnp.asarray(g["pcl_pc_labels"]).astype(jnp.int32),
        jnp.asarray(g["pcl_pc_count"]),
        jnp.asarray(g["pcl_img_w"]),
        jnp.asarray(g["pcl_im_labels"]),
    )
    np.testing.assert_allclose(float(loss), float(g["pcl_loss"]), rtol=1e-5)


def test_pcl_loss_backward_parity(g):
    """JAX autodiff of pcl_losses reproduces the reference's hand-written
    backward (pcl_loss_backward_cpu, normalized by R in the wrapper)."""
    grad = jax.grad(
        lambda p: pcl_losses(
            p,
            jnp.asarray(g["pcl_labels"]).astype(jnp.int32),
            jnp.asarray(g["pcl_w"]),
            jnp.asarray(g["pcl_assign"]).astype(jnp.int32),
            jnp.asarray(g["pcl_pc_labels"]).astype(jnp.int32),
            jnp.asarray(g["pcl_pc_count"]),
            jnp.asarray(g["pcl_img_w"]),
            jnp.asarray(g["pcl_im_labels"]),
        )
    )(jnp.asarray(g["pcl_probs"]))
    np.testing.assert_allclose(np.asarray(grad), g["pcl_grad"], rtol=1e-4, atol=1e-6)


def test_roi_label_parity(g):
    out = roi_label(
        jnp.asarray(g["rl_S"]),
        jnp.asarray(g["rl_U"]),
        jnp.asarray(g["rl_L"]),
        jnp.asarray(g["rl_CW"]),
        fg_threshold=float(g["rl_fg"]),
        bg_threshold_hi=float(g["rl_hi"]),
        bg_threshold_lo=float(g["rl_lo"]),
        top_k=int(g["rl_top_k"]),
    )
    np.testing.assert_array_equal(np.asarray(out["label"]), g["rl_RL"])
    np.testing.assert_allclose(np.asarray(out["weight"]), g["rl_RW"], rtol=1e-6)


# ---------------------------------------------------------------------------
# CSC: brute-force oracle transcribed from csc_cuda.cu (float32 throughout,
# C round() = half-away-from-zero)
# ---------------------------------------------------------------------------


def _csc_bruteforce(cpgs, labels, preds, rois, fg_threshold=0.1,
                    area_sqrt=True, context_scale=1.8):
    """Numpy transcription of csc_forward_cuda (csc_cuda.cu:352): binarize +
    integral image (binary_and_integral_cpu :131), CSCPool frame/context
    contrast (:184), per-class normalization (:488-526), prediction blending
    (:527-530). batch_size == 1 only (matching the reference's usage)."""
    f32 = np.float32
    num_classes = labels.shape[1]
    num_rois = rois.shape[0]
    h_im, w_im = cpgs.shape[2], cpgs.shape[3]
    W = np.ones((num_rois, num_classes), f32)

    def rnd(x):  # C round(): half away from zero, f32
        x = f32(x)
        return f32(np.sign(x) * np.floor(np.abs(x) + f32(0.5)))

    for c in range(num_classes):
        label_value = labels[0, c]
        pred_value = f32(preds[0, c])
        if label_value < 0.5:
            continue
        m = cpgs[0, c]
        binary = (m >= f32(fg_threshold)).astype(f32)
        integ = np.cumsum(np.cumsum(binary, 0, dtype=f32), 1, dtype=f32)

        def bsum(hs, ws, he, we):
            a1 = integ[he, we]
            a2 = integ[he, ws - 1] if ws - 1 >= 0 else f32(0)
            a3 = integ[hs - 1, we] if hs - 1 >= 0 else f32(0)
            a4 = integ[hs - 1, ws - 1] if (hs - 1 >= 0 and ws - 1 >= 0) else f32(0)
            return f32(f32(a1 - a2) - f32(a3 - a4))

        scores = np.zeros(num_rois, f32)
        for r in range(num_rois):
            ws = int(max(min(rnd(rois[r, 0]), w_im - 1), 0))
            hs = int(max(min(rnd(rois[r, 1]), h_im - 1), 0))
            we = int(max(min(rnd(rois[r, 2]), w_im - 1), 0))
            he = int(max(min(rnd(rois[r, 3]), h_im - 1), 0))
            width_roi = f32(we - ws)
            height_roi = f32(he - hs)
            w_in = f32(width_roi / f32(context_scale))
            h_in = f32(height_roi / f32(context_scale))
            w_out = f32(width_roi * f32(context_scale))
            h_out = f32(height_roi * f32(context_scale))
            wc = f32(f32(we + ws) / 2)
            hc = f32(f32(he + hs) / 2)
            ws_i = int(rnd(wc - w_in / 2))
            hs_i = int(rnd(hc - h_in / 2))
            we_i = int(rnd(wc + w_in / 2))
            he_i = int(rnd(hc + h_in / 2))
            ws_o = int(rnd(max(wc - w_out / 2, f32(0))))
            hs_o = int(rnd(max(hc - h_out / 2, f32(0))))
            we_o = int(rnd(min(wc + w_out / 2, f32(w_im - 1))))
            he_o = int(rnd(min(hc + h_out / 2, f32(h_im - 1))))
            area_roi = f32((he - hs + 1) * (we - ws + 1))
            area_inner = f32((he_i - hs_i + 1) * (we_i - ws_i + 1))
            area_outer = f32((he_o - hs_o + 1) * (we_o - ws_o + 1))
            area_frame = max(f32(area_roi - area_inner), f32(1))
            area_context = max(f32(area_outer - area_roi), f32(1))
            sum_roi = bsum(hs, ws, he, we)
            sum_inner = bsum(hs_i, ws_i, he_i, we_i)
            sum_outer = bsum(hs_o, ws_o, he_o, we_o)
            sum_frame = f32(sum_roi - sum_inner)
            sum_context = f32(sum_outer - sum_roi)
            if area_sqrt:
                scores[r] = f32(
                    f32(sum_frame / np.sqrt(area_frame, dtype=f32))
                    - f32(sum_context / np.sqrt(area_context, dtype=f32))
                )
            else:
                scores[r] = f32(
                    f32(sum_frame / area_frame) - f32(sum_context / area_context)
                )

        max_value = f32(0)
        min_value = f32(0)
        for r in range(num_rois):
            if scores[r] > max_value:
                max_value = scores[r]
            if scores[r] < min_value:
                min_value = scores[r]
        if max_value > 0 and min_value < 0:
            col = np.where(scores > 0, scores / max_value, scores / (-min_value))
        elif max_value > 0 and min_value == 0:
            col = scores / max_value
        else:
            col = np.ones(num_rois, f32)
        W[:, c] = pred_value * col.astype(f32) + f32(1 - pred_value)
    return W


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_csc_parity(seed):
    from jtsm_tpu.wsl.modeling.wsod_zoo import csc_full

    rng = np.random.RandomState(seed)
    h, w, num_rois, num_classes = 40, 56, 64, 6
    cpgs = rng.rand(1, num_classes, h, w).astype(np.float32)
    # the reference caller normalizes each map to max 1 (roi_heads_csc.py:482)
    cpgs /= cpgs.max(axis=(2, 3), keepdims=True)
    labels = (rng.rand(1, num_classes) > 0.4).astype(np.float32)
    labels[0, 0] = 1.0  # at least one present class
    preds = rng.rand(1, num_classes).astype(np.float32)

    x1 = rng.rand(num_rois) * w * 0.7
    y1 = rng.rand(num_rois) * h * 0.7
    # some boxes extend past the image to exercise the clamping path
    boxes = np.stack(
        [x1, y1, x1 + 1 + rng.rand(num_rois) * w * 0.5,
         y1 + 1 + rng.rand(num_rois) * h * 0.5], 1
    ).astype(np.float32)

    ref = _csc_bruteforce(cpgs, labels, preds, boxes)
    got = np.asarray(
        csc_full(
            jnp.asarray(cpgs[0]),
            jnp.asarray(boxes),
            jnp.ones(num_rois, bool),
            jnp.asarray(labels[0]),
            jnp.asarray(preds[0]),
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=2e-6)


def test_csc_parity_degenerate_columns():
    """All-zero and all-positive score columns hit the normalization's
    max==0 -> all-ones and min==0 -> divide-by-max branches."""
    from jtsm_tpu.wsl.modeling.wsod_zoo import csc_full

    h, w = 24, 24
    cpgs = np.zeros((1, 2, h, w), np.float32)
    cpgs[0, 1, 8:16, 8:16] = 1.0  # hot square fully inside box 0
    labels = np.ones((1, 2), np.float32)
    preds = np.asarray([[0.8, 0.6]], np.float32)
    boxes = np.asarray(
        [[8.0, 8.0, 16.0, 16.0], [0.0, 0.0, 23.0, 23.0]], np.float32
    )
    ref = _csc_bruteforce(cpgs, labels, preds, boxes)
    got = np.asarray(
        csc_full(
            jnp.asarray(cpgs[0]),
            jnp.asarray(boxes),
            jnp.ones(2, bool),
            jnp.asarray(labels[0]),
            jnp.asarray(preds[0]),
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=2e-6)
    # class 0 has an all-zero CPG map -> normalization collapses to 1 ->
    # W = pred * 1 + (1 - pred) = 1 exactly
    np.testing.assert_allclose(got[:, 0], 1.0)
