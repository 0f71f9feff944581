"""Numeric parity of the non-R-CNN heads against the REFERENCE torch
implementation (recorded by tests/refkit/record_heads.py):

* RetinaNet — head towers on the reference's own FPN features, full
  decode+NMS inference rank-for-rank, and the train-mode focal/smooth-l1
  loss dict on identical GT (reference meta_arch/retinanet.py:40-505; the
  EMA focal normalizer is recorded with momentum 0 — the stateless jitted
  step's documented deviation — so the loss FORMULAS are pinned exactly).
* keypoint heatmap decode — structures/keypoints.py:143
  ``heatmaps_to_keypoints``. The reference bicubic-upsamples each ROI's
  heatmap to its pixel size before the argmax; the repo decodes on the raw
  56-grid with half-bin offsets (static shapes), so positions are pinned to
  within 1.5 heatmap bins and peak logits/probs at matching argmaxes.
* panoptic fusion — meta_arch/panoptic_fpn.py:133
  ``combine_semantic_and_instance_outputs``: identical greedy painting,
  id-for-id.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/detectron2"),
    reason="reference tree absent",
)


# ------------------------------------------------------------- retinanet
@pytest.fixture(scope="module")
def retina():
    from tests.refkit.record_heads import RETINA_B, RETINA_SIZE, get_retinanet_case

    rec = get_retinanet_case()

    from jtsm_tpu.checkpoint import convert_d2_state_dict_to_variables
    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.modeling import build_model

    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(
            os.path.dirname(__file__), "..", "configs/COCO-Detection/retinanet_R_50_FPN_1x.yaml"
        )
    )
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    # reference NMS is uncapped; cover every above-threshold candidate on
    # this adversarial random-weight case (5 levels x 1000 topk)
    model = model.clone(nms_candidates_test=5000)

    b, s = RETINA_B, RETINA_SIZE
    batch = {
        "image": jnp.zeros((b, s, s, 3), jnp.float32),
        "image_sizes": jnp.asarray([[s, s]] * b, jnp.int32),
        "orig_sizes": jnp.asarray([[s, s]] * b, jnp.int32),
        "gt_boxes": jnp.zeros((b, 2, 4)),
        "gt_classes": jnp.zeros((b, 2), jnp.int32),
        "gt_valid": jnp.zeros((b, 2), bool),
    }
    template = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, batch, train=True)
    )
    sd = {k[3:]: rec[k] for k in rec if k.startswith("sd.")}
    converted, matched, unmatched = convert_d2_state_dict_to_variables(sd, dict(template))
    assert unmatched == ["pixel_mean", "pixel_std"], unmatched[:10]
    leftovers = []

    def mat(path, x):
        if isinstance(x, jax.ShapeDtypeStruct):
            leftovers.append("/".join(map(str, path)))
            return np.zeros(x.shape, x.dtype)
        return x

    converted = jax.tree_util.tree_map_with_path(mat, converted)
    assert not leftovers, leftovers[:10]
    return dict(rec=rec, model=model, variables=converted, b=b, s=s)


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_retinanet_head_towers_parity(retina):
    """cls/bbox towers on the reference's own FPN features."""
    rec, model, variables = retina["rec"], retina["model"], retina["variables"]
    feats = [_nhwc(rec[f"feat_l{li}"]) for li in range(5)]
    head = model.head
    with jax.default_matmul_precision("highest"):
        logits, deltas = head.apply({"params": variables["params"]["head"]}, feats)
    for li in range(5):
        ref_l = np.transpose(rec[f"logits_l{li}"], (0, 2, 3, 1))
        ref_d = np.transpose(rec[f"deltas_l{li}"], (0, 2, 3, 1))
        rel_l = np.abs(np.asarray(logits[li]) - ref_l).max() / (np.abs(ref_l).max() + 1e-6)
        rel_d = np.abs(np.asarray(deltas[li]) - ref_d).max() / (np.abs(ref_d).max() + 1e-6)
        assert rel_l < 2e-4 and rel_d < 2e-4, (li, rel_l, rel_d)


def test_retinanet_inference_parity(retina):
    """Full model: decode + NMS detections rank-for-rank."""
    rec, model, variables = retina["rec"], retina["model"], retina["variables"]
    b, s = retina["b"], retina["s"]
    imgs = np.stack([rec[f"image{i}"] for i in range(b)]).transpose(0, 2, 3, 1)
    batch = {
        "image": jnp.asarray(imgs),
        "image_sizes": jnp.asarray([[s, s]] * b, jnp.int32),
        "orig_sizes": jnp.asarray([[s, s]] * b, jnp.int32),
    }
    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, batch, train=False)
    for i in range(b):
        valid = np.asarray(out["valid"][i])
        n_ref = len(rec[f"scores{i}"])
        # invalid (clipped-to-empty) slots interleave in the static layout;
        # the reference drops them — compare the valid subset in score order
        assert valid.sum() == n_ref, (valid.sum(), n_ref)
        np.testing.assert_allclose(
            np.asarray(out["scores"][i])[valid], rec[f"scores{i}"], rtol=2e-4, atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(out["classes"][i])[valid], rec[f"classes{i}"]
        )
        np.testing.assert_allclose(
            np.asarray(out["boxes"][i])[valid], rec[f"boxes{i}"], rtol=2e-3, atol=2e-3
        )


def test_retinanet_train_loss_parity(retina):
    """Focal cls + smooth-l1 reg losses with the max(num_pos, 1) normalizer
    on identical GT (deterministic anchor matching — no sampling)."""
    rec, model, variables = retina["rec"], retina["model"], retina["variables"]
    b, s = retina["b"], retina["s"]
    imgs = np.stack([rec[f"image{i}"] for i in range(b)]).transpose(0, 2, 3, 1)
    g = max(len(rec[f"gt_classes{i}"]) for i in range(b))
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_classes = np.zeros((b, g), np.int32)
    gt_valid = np.zeros((b, g), bool)
    for i in range(b):
        n = len(rec[f"gt_classes{i}"])
        gt_boxes[i, :n] = rec[f"gt_boxes{i}"]
        gt_classes[i, :n] = rec[f"gt_classes{i}"]
        gt_valid[i, :n] = True
    batch = {
        "image": jnp.asarray(imgs),
        "image_sizes": jnp.asarray([[s, s]] * b, jnp.int32),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_valid": jnp.asarray(gt_valid),
    }
    with jax.default_matmul_precision("highest"):
        losses = model.apply(variables, batch, train=True)
    for name in ("loss_cls", "loss_box_reg"):
        ref_v = float(rec[f"loss.{name}"])
        got = float(losses[name])
        assert abs(got - ref_v) < 1e-4 * max(abs(ref_v), 0.01), (name, got, ref_v)


# ------------------------------------------------------- keypoint decode
def test_heatmaps_to_keypoints_parity():
    from tests.refkit.record_heads import get_kp_decode_case

    from jtsm_tpu.structures.keypoints import heatmaps_to_keypoints

    rec = get_kp_decode_case()
    out = np.asarray(
        heatmaps_to_keypoints(jnp.asarray(rec["maps"]), jnp.asarray(rec["rois"]))
    )
    ref = rec["keypoints"]  # (N, K, 4): x, y, logit, prob
    rois = rec["rois"]
    hm = rec["maps"].shape[-1]
    bin_w = np.maximum(rois[:, 2] - rois[:, 0], 1.0) / hm
    bin_h = np.maximum(rois[:, 3] - rois[:, 1], 1.0) / hm
    dx = np.abs(out[..., 0] - ref[..., 0]) / bin_w[:, None]
    dy = np.abs(out[..., 1] - ref[..., 1]) / bin_h[:, None]
    # raw-grid argmax + half-bin vs bicubic-upsampled argmax: within 1.5 bins
    assert dx.max() < 1.5 and dy.max() < 1.5, (dx.max(), dy.max())
    assert np.median(dx) < 0.6 and np.median(dy) < 0.6
    # where the argmax bin coincides (the overwhelming majority), the peak
    # logit matches the reference's sampled peak closely
    same = (dx < 0.51) & (dy < 0.51)
    assert same.mean() > 0.9
    # the reference reports the BICUBIC-RESAMPLED peak value (smoothed by
    # the per-ROI upsample), the repo the raw bin value — same peak, so the
    # values must be strongly rank-correlated and the repo's raw peak must
    # dominate the reference's smoothed one
    ours_l, ref_l = out[..., 2][same], ref[..., 2][same]
    assert np.corrcoef(ours_l, ref_l)[0, 1] > 0.5
    assert np.mean(ours_l >= ref_l - 0.2) > 0.95


# ------------------------------------------------------- panoptic fusion
def test_panoptic_fusion_parity():
    from tests.refkit.record_heads import get_panoptic_fusion_case

    from jtsm_tpu.modeling.meta_arch.panoptic_fpn import (
        combine_semantic_and_instance_outputs,
    )

    rec = get_panoptic_fusion_case()
    pan, infos = combine_semantic_and_instance_outputs(
        rec["masks"],
        rec["scores"],
        rec["classes"],
        np.ones(len(rec["scores"]), bool),
        rec["sem"].astype(np.int64),
        overlap_threshold=0.5,
        stuff_area_limit=1500,
        instances_confidence_threshold=0.45,
    )
    np.testing.assert_array_equal(pan.astype(np.int32), rec["panoptic"])
    assert len(infos) == int(rec["n_segments"])
    for i, info in enumerate(infos):
        assert info["id"] == int(rec[f"seg{i}_id"])
        assert int(info["isthing"]) == int(rec[f"seg{i}_isthing"])
        assert info["category_id"] == int(rec[f"seg{i}_category"])
