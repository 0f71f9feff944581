"""Model-level numeric parity against the REFERENCE torch implementation.

The reference detectron2 (at /root/reference) is imported with stub deps and
run on CPU (tests/refkit) on seeded random weights + fixed images; the same
state_dict is converted through ``convert_d2_state_dict_to_variables`` and
THIS repo's models must reproduce each stage's numerics:

* backbone+FPN features on the same preprocessed images
* RPN head logits/deltas on the reference's own features
* proposal selection (decode -> clip -> per-level NMS -> topk) on the
  reference's own head outputs — rank-for-rank
* ROIAlign pooling on the reference's own proposals
* box head + predictor on the reference's own pooled features
* final per-class NMS inference on the reference's own scores/deltas
* full roi_heads (incl. mask branch) on fixed features+proposals
* mask head logits on the reference's own pooled mask features

Cases: Mask R-CNN R50-FPN (reference
configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml, meta_arch
rcnn.py:125) and Faster R-CNN R50-C4. Comparisons run with
``jax.default_matmul_precision("highest")`` — the platform-default matmul
precision (bf16 passes on TPU) is a deliberate production trade, not a
numerics bug, and is excluded here.

Score margins: the recorder scales the decision heads so adjacent ranks are
separated by far more than f32 noise (see refkit/record.py); every
rank-for-rank comparison below relies on that.
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

CASES = ["maskrcnn_r50fpn", "fasterrcnn_r50c4"]

MY_CONFIGS = {
    "maskrcnn_r50fpn": "configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml",
    "fasterrcnn_r50c4": "configs/COCO-Detection/faster_rcnn_R_50_C4_1x.yaml",
}
SIZES = {"maskrcnn_r50fpn": (320, 320), "fasterrcnn_r50c4": (256, 256)}
FPN_LEVELS = ["p2", "p3", "p4", "p5", "p6"]


@pytest.fixture(scope="module", params=CASES)
def case(request):
    from tests.refkit.record import get_case

    name = request.param
    rec = get_case(name)

    from jtsm_tpu.checkpoint import convert_d2_state_dict_to_variables
    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.modeling import build_model

    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", MY_CONFIGS[name])
    )
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.02
    model = build_model(cfg)

    h, w = SIZES[name]
    b = 2
    batch = {
        "image": jnp.zeros((b, h, w, 3), jnp.float32),
        "image_sizes": jnp.asarray([[h, w]] * b, jnp.int32),
        "orig_sizes": jnp.asarray([[h, w]] * b, jnp.int32),
    }
    template = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.key(0), "sampling": jax.random.key(0)},
            batch,
            train=False,
        )
    )
    sd = {k[3:]: rec[k] for k in rec if k.startswith("sd.")}
    converted, matched, unmatched = convert_d2_state_dict_to_variables(
        sd, dict(template)
    )
    assert unmatched == ["pixel_mean", "pixel_std"], unmatched[:10]
    # materialize any template leaves the checkpoint did not cover
    leftovers = []

    def mat(path, x):
        if isinstance(x, jax.ShapeDtypeStruct):
            leftovers.append("/".join(map(str, path)))
            return np.zeros(x.shape, x.dtype)
        return x

    converted = jax.tree_util.tree_map_with_path(mat, converted)
    assert not leftovers, f"unconverted model leaves: {leftovers[:10]}"

    return dict(name=name, rec=rec, cfg=cfg, model=model, variables=converted, hw=(h, w), b=b)


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _levels(case):
    return FPN_LEVELS if case["name"] == "maskrcnn_r50fpn" else ["res4"]


def _rel(ours, theirs):
    return np.abs(ours - theirs).max() / (np.abs(theirs).max() + 1e-6)


def _apply(case, fn, *args):
    with jax.default_matmul_precision("highest"):
        return case["model"].apply(case["variables"], *args, method=fn)


def test_backbone_parity(case):
    rec, cfg = case["rec"], case["cfg"]
    imgs = np.stack([rec["image0"], rec["image1"]]).transpose(0, 2, 3, 1)
    mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
    std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
    x = jnp.asarray((imgs - mean) / std)
    feats = _apply(case, lambda m, x: m.backbone(x), x)
    for k in _levels(case):
        ours = np.asarray(feats[k]).transpose(0, 3, 1, 2)
        theirs = rec[f"feat_{k}"]
        assert ours.shape == theirs.shape
        assert _rel(ours, theirs) < 2e-4, (k, _rel(ours, theirs))


def test_rpn_head_parity(case):
    rec = case["rec"]
    feats = [_nhwc(rec[f"feat_{k}"]) for k in _levels(case)]
    logits, deltas = _apply(
        case, lambda m, f: m.proposal_generator.head(f), feats
    )
    for li in range(len(feats)):
        ml = np.asarray(logits[li]).transpose(0, 3, 1, 2)
        md = np.asarray(deltas[li]).transpose(0, 3, 1, 2)
        assert np.abs(ml - rec[f"rpn_logits_l{li}"]).max() < 1e-3
        assert np.abs(md - rec[f"rpn_deltas_l{li}"]).max() < 1e-3


def _my_anchors(case):
    from jtsm_tpu.layers import ShapeSpec
    from jtsm_tpu.modeling.anchor_generator import build_anchor_generator

    rec = case["rec"]
    if case["name"] == "maskrcnn_r50fpn":
        strides = [4, 8, 16, 32, 64]
    else:
        strides = [16]
    shapes = [ShapeSpec(channels=256, stride=s) for s in strides]
    ag = build_anchor_generator(case["cfg"], shapes)
    grid_sizes = [rec[f"feat_{k}"].shape[-2:] for k in _levels(case)]
    return ag(grid_sizes)


def test_proposal_selection_parity(case):
    """Decode + clip + per-level NMS + topk on the reference's own head
    outputs must reproduce the reference's proposals rank-for-rank
    (find_top_rpn_proposals, reference proposal_utils.py:20)."""
    from jtsm_tpu.modeling.proposal_generator.proposal_utils import (
        find_top_rpn_proposals_single,
    )
    from jtsm_tpu.ops.box_regression import Box2BoxTransform

    rec = case["rec"]
    cfg = case["cfg"]
    anchors = _my_anchors(case)
    tfm = Box2BoxTransform(weights=(1.0, 1.0, 1.0, 1.0))
    h, w = case["hw"]
    pre_k = cfg.MODEL.RPN.PRE_NMS_TOPK_TEST
    post_k = cfg.MODEL.RPN.POST_NMS_TOPK_TEST
    with jax.default_matmul_precision("highest"):
        for i in range(case["b"]):
            boxes_lvls, score_lvls = [], []
            for li, anc in enumerate(anchors):
                lg = rec[f"rpn_logits_l{li}"][i]  # (A, H, W)
                dl = rec[f"rpn_deltas_l{li}"][i]  # (A*4, H, W)
                a = lg.shape[0]
                lg_flat = jnp.asarray(lg.transpose(1, 2, 0).reshape(-1))
                dl_flat = jnp.asarray(
                    dl.reshape(a, 4, *dl.shape[1:]).transpose(2, 3, 0, 1).reshape(-1, 4)
                )
                k = min(pre_k, lg_flat.shape[0])
                topv, topi = jax.lax.top_k(lg_flat, k)
                dec = tfm.apply_deltas(dl_flat[topi], anc[topi])
                boxes_lvls.append(dec)
                score_lvls.append(topv)
            got_boxes, got_scores = find_top_rpn_proposals_single(
                boxes_lvls,
                score_lvls,
                jnp.asarray([h, w]),
                cfg.MODEL.RPN.NMS_THRESH,
                pre_k,
                post_k,
                cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE,
            )
            got_boxes = np.asarray(got_boxes)
            got_scores = np.asarray(got_scores)
            valid = np.isfinite(got_scores)
            ref_boxes, ref_scores = rec[f"prop_boxes{i}"], rec[f"prop_logits{i}"]
            n = min(valid.sum(), len(ref_scores))
            assert n >= len(ref_scores) * 0.99
            o_g = np.argsort(-got_scores[valid])
            o_r = np.argsort(-ref_scores)
            np.testing.assert_allclose(
                got_scores[valid][o_g][:n], ref_scores[o_r][:n], atol=2e-4
            )
            np.testing.assert_allclose(
                got_boxes[valid][o_g][:n], ref_boxes[o_r][:n], atol=2e-2
            )


def test_box_pooler_parity(case):
    """My ROIAlign (XLA path on CPU) vs the reference's compiled
    ROIAlign_cpu.cpp, on the reference's own features and proposals."""
    rec = case["rec"]
    feats = [_nhwc(rec[f"feat_{k}"]) for k in _levels(case)]
    n_per = [len(rec[f"prop_boxes{i}"]) for i in range(case["b"])]
    boxes = jnp.asarray(
        np.concatenate([rec[f"prop_boxes{i}"] for i in range(case["b"])])
    )
    bidx = jnp.asarray(
        np.concatenate(
            [np.full(n, i, np.int32) for i, n in enumerate(n_per)]
        )
    )

    def pool(m, f, bx, bi):
        rh = m.roi_heads
        pooler = getattr(rh, "box_pooler", None) or rh.pooler
        return pooler(f, bx, bi)

    with jax.default_matmul_precision("highest"):
        pooled = _apply(case, pool, feats, boxes, bidx)
    ours = np.asarray(pooled).transpose(0, 3, 1, 2)
    theirs = rec["pooled_box_features"]
    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)

    # the adaptive mode is exact for ROIs whose bins need <= ADAPTIVE_MAX_RATIO
    # samples per axis; extreme-aspect proposals beyond that use the capped
    # grid (documented in ops/roi_align.py). Verify exactness on the
    # uncapped ROIs and that the capped tail is small.
    from jtsm_tpu.modeling.poolers import assign_boxes_to_levels
    from jtsm_tpu.ops.roi_align import ADAPTIVE_MAX_RATIO

    bx = np.asarray(boxes)
    if case["name"] == "maskrcnn_r50fpn":
        lvl = np.asarray(assign_boxes_to_levels(boxes, 2, 5, 224, 4))
        stride = np.asarray([4, 8, 16, 32, 64])[np.clip(lvl, 0, 3)]
    else:
        stride = np.full(len(bx), 16)
    out_size = ours.shape[-1]
    binw = (bx[:, 2] - bx[:, 0]) / stride / out_size
    binh = (bx[:, 3] - bx[:, 1]) / stride / out_size
    uncapped = (np.ceil(binw) <= ADAPTIVE_MAX_RATIO) & (
        np.ceil(binh) <= ADAPTIVE_MAX_RATIO
    )
    assert uncapped.mean() > 0.9, uncapped.mean()
    assert _rel(ours[uncapped], theirs[uncapped]) < 1e-3, _rel(
        ours[uncapped], theirs[uncapped]
    )
    # capped ROIs still pool a close approximation
    if (~uncapped).any():
        assert _rel(ours[~uncapped], theirs[~uncapped]) < 5e-2


def test_box_head_parity(case):
    if case["name"] != "maskrcnn_r50fpn":
        pytest.skip("C4 box stage covered by test_roiheads_on_fixed_proposals")
    rec = case["rec"]
    x = _nhwc(rec["pooled_box_features"])
    scores, deltas = _apply(
        case,
        lambda m, x: m.roi_heads.box_predictor(m.roi_heads.box_head(x)),
        x,
    )
    assert np.abs(np.asarray(scores) - rec["box_scores"]).max() < 2e-3
    assert np.abs(np.asarray(deltas) - rec["box_deltas"]).max() < 2e-3


def _assert_detections_match(got_s, got_b, got_c, ref_s, ref_b, ref_c, miss=5):
    """Set matching (adjacent detections can swap ranks at near-tie scores):
    every reference detection must have an identical-within-noise counterpart
    (same class, score within 1e-3, box within 0.1px). ``miss`` absorbs
    clusters of near-duplicate proposals whose decoded boxes sit at the NMS
    IoU boundary with scores equal to ~1e-5 — there, sub-float-noise score
    order legitimately decides which subset survives greedy NMS (observed:
    border-sliver clusters in the C4 case; both outcomes are correct)."""
    used = np.zeros(len(got_s), bool)
    matched = 0
    for j in range(len(ref_s)):
        cand = (
            (~used)
            & (got_c == ref_c[j])
            & (np.abs(got_s - ref_s[j]) < 1e-3)
            & (np.abs(got_b - ref_b[j][None]).max(-1) < 1e-1)
        )
        k = np.flatnonzero(cand)
        if len(k):
            used[k[0]] = True
            matched += 1
    assert matched >= len(ref_s) - miss, (matched, len(ref_s))


def test_final_inference_parity(case):
    """Per-class threshold -> NMS -> topk on the reference's own scores and
    deltas reproduces the reference's final detections rank-for-rank
    (reference fast_rcnn.py:46 fast_rcnn_inference)."""
    from jtsm_tpu.modeling.roi_heads.fast_rcnn import fast_rcnn_inference_single
    from jtsm_tpu.ops.box_regression import Box2BoxTransform

    rec, cfg = case["rec"], case["cfg"]
    h, w = case["hw"]
    tfm = Box2BoxTransform(weights=tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS))
    n0 = len(rec["prop_boxes0"])
    with jax.default_matmul_precision("highest"):
        for i in range(case["b"]):
            sl = slice(i * n0, (i + 1) * n0)
            out = fast_rcnn_inference_single(
                jnp.asarray(rec["box_scores"][sl]),
                jnp.asarray(rec["box_deltas"][sl]),
                jnp.asarray(rec[f"prop_boxes{i}"]),
                jnp.ones((n0,), bool),
                jnp.asarray([h, w]),
                tfm,
                cfg.MODEL.ROI_HEADS.NUM_CLASSES,
                0.02,
                cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                100,
                nms_candidates=4096,
            )
            got_s = np.asarray(out["scores"])[np.asarray(out["valid"])]
            got_b = np.asarray(out["boxes"])[np.asarray(out["valid"])]
            got_c = np.asarray(out["classes"])[np.asarray(out["valid"])]
            ref_s, ref_b, ref_c = rec[f"scores{i}"], rec[f"boxes{i}"], rec[f"classes{i}"]
            assert len(got_s) >= len(ref_s) - 2, (len(got_s), len(ref_s))
            _assert_detections_match(got_s, got_b, got_c, ref_s, ref_b, ref_c)


def test_roiheads_on_fixed_proposals(case):
    """Full roi_heads inference (box branch + NMS + mask branch) on the
    reference's own features and proposals: final detections must match the
    reference's rank-for-rank (reference roi_heads.py StandardROIHeads /
    Res5ROIHeads forward, eval branch)."""
    rec = case["rec"]
    h, w = case["hw"]
    feats = {k: _nhwc(rec[f"feat_{k}"]) for k in _levels(case)}
    n0 = len(rec["prop_boxes0"])
    proposals = jnp.asarray(
        np.stack([rec[f"prop_boxes{i}"] for i in range(case["b"])])
    )
    prop_scores = jnp.asarray(
        np.stack([rec[f"prop_logits{i}"] for i in range(case["b"])])
    )
    sizes = jnp.asarray([[h, w]] * case["b"], jnp.int32)

    def run(m, f, p, ps, s):
        return m.roi_heads(f, p, ps, s, None, train=False)

    with jax.default_matmul_precision("highest"):
        detections, _ = _apply(case, run, feats, proposals, prop_scores, sizes)
    for i in range(case["b"]):
        valid = np.asarray(detections["valid"][i]).astype(bool)
        got_s = np.asarray(detections["scores"][i])[valid]
        got_b = np.asarray(detections["boxes"][i])[valid]
        got_c = np.asarray(detections["classes"][i])[valid]
        ref_s, ref_b, ref_c = rec[f"scores{i}"], rec[f"boxes{i}"], rec[f"classes{i}"]
        assert len(got_s) >= len(ref_s) - 3, (len(got_s), len(ref_s))
        _assert_detections_match(got_s, got_b, got_c, ref_s, ref_b, ref_c)


def test_mask_head_parity(case):
    if "mask_logits" not in case["rec"]:
        pytest.skip("case has no mask branch")
    rec = case["rec"]
    x = _nhwc(rec["pooled_mask_features"])
    logits = _apply(case, lambda m, x: m.roi_heads.mask_head(x), x)
    ours = np.asarray(logits).transpose(0, 3, 1, 2)
    assert ours.shape == rec["mask_logits"].shape
    assert np.abs(ours - rec["mask_logits"]).max() < 2e-3


@pytest.mark.parametrize("arch", ["r18fpn", "r18c4"])
def test_ap_parity_trained_model(arch):
    """AP-level parity: the reference model is briefly TRAINED (torch CPU,
    seeded) on a synthetic detection set; its weights are converted and both
    models run inference on the full set. AP (computed by THIS repo's
    COCOEval for both, isolating model numerics from evaluator differences)
    must agree within 0.3 — the north-star tolerance (BASELINE.md).
    Covers Mask R-CNN R18-FPN (box + mask AP) and Faster R-CNN R18-C4
    (box AP through the single-level res4->res5 pathway). Reference: the
    whole GeneralizedRCNN.forward inference path (rcnn.py:125-246)."""
    from tests.refkit.record import (
        IMG_SIZE,
        N_CLASSES,
        N_TRAIN_IMAGES,
        TRAINED_ARCHS,
        get_trained_case,
        trained_cfg_overrides,
    )

    from jtsm_tpu.checkpoint import convert_d2_state_dict_to_variables
    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.data.rle import rle_string_encode
    from jtsm_tpu.evaluation.coco_evaluation import batched_outputs_to_coco_json
    from jtsm_tpu.evaluation.cocoeval import COCOEval
    from jtsm_tpu.modeling import build_model

    mask_on = TRAINED_ARCHS[arch]["mask_on"]
    rec = get_trained_case(arch)

    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(
            os.path.dirname(__file__), "..", TRAINED_ARCHS[arch]["config"]
        )
    )
    trained_cfg_overrides(cfg, arch)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)

    n, s = N_TRAIN_IMAGES, IMG_SIZE
    imgs = np.stack([rec[f"image{i}"] for i in range(n)]).transpose(0, 2, 3, 1)
    batch = {
        "image": jnp.asarray(imgs),
        "image_sizes": jnp.asarray([[s, s]] * n, jnp.int32),
        "orig_sizes": jnp.asarray([[s, s]] * n, jnp.int32),
    }
    template = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.key(0), "sampling": jax.random.key(0)},
            batch,
            train=False,
        )
    )
    sd = {k[3:]: rec[k] for k in rec if k.startswith("sd.")}
    converted, matched, unmatched = convert_d2_state_dict_to_variables(
        sd, dict(template)
    )
    assert unmatched == ["pixel_mean", "pixel_std"], unmatched[:10]
    converted = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, x.dtype) if isinstance(x, jax.ShapeDtypeStruct) else x,
        converted,
    )

    with jax.default_matmul_precision("highest"):
        out = jax.jit(lambda v, b: model.apply(v, b, train=False))(converted, batch)

    # COCO-format gt
    images = [{"id": i, "height": s, "width": s} for i in range(n)]
    annotations = []
    for i in range(n):
        for b, c, m in zip(rec[f"gt_boxes{i}"], rec[f"gt_classes{i}"], rec[f"gt_masks{i}"]):
            x0, y0, x1, y1 = [float(v) for v in b]
            annotations.append(
                {
                    "id": len(annotations) + 1,
                    "image_id": i,
                    "category_id": int(c) + 1,
                    "bbox": [x0, y0, x1 - x0, y1 - y0],
                    "segmentation": rle_string_encode(m.astype(bool)),
                    "area": float((x1 - x0) * (y1 - y0)),
                    "iscrowd": 0,
                }
            )
    gt = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c + 1, "name": f"c{c}"} for c in range(N_CLASSES)],
    }

    # reference detections
    ref_dets = []
    for i in range(n):
        masks_i = (
            rec[f"pred_masks{i}"]
            if mask_on
            else [None] * len(rec[f"pred_scores{i}"])
        )
        for b, sc, c, m in zip(
            rec[f"pred_boxes{i}"],
            rec[f"pred_scores{i}"],
            rec[f"pred_classes{i}"],
            masks_i,
        ):
            x0, y0, x1, y1 = [float(v) for v in b]
            det = {
                "image_id": i,
                "category_id": int(c) + 1,
                "score": float(sc),
                "bbox": [x0, y0, x1 - x0, y1 - y0],
            }
            if m is not None:
                det["segmentation"] = rle_string_encode(m.astype(bool))
            ref_dets.append(det)

    # my detections (shift category ids to 1-based like the gt above)
    my_dets = batched_outputs_to_coco_json(
        {k: np.asarray(v) for k, v in out.items()},
        np.arange(n),
        np.asarray([[s, s]] * n),
        None,
        mask_on,
    )
    for d in my_dets:
        d["category_id"] += 1

    results = {}
    for iou_type in ("bbox", "segm") if mask_on else ("bbox",):
        ap_ref = COCOEval(gt, iou_type).evaluate(ref_dets)["AP"] * 100
        ap_jax = COCOEval(gt, iou_type).evaluate(my_dets)["AP"] * 100
        results[iou_type] = (ap_ref, ap_jax)

    bb_ref, bb_jax = results["bbox"]
    # the comparison is only meaningful if the trained model actually works.
    # The C4 bound is lower: its coarse single-level stride-16 RPN caps the
    # synthetic-set AP around 20 (measured 20.6 on the pinned seed), and the
    # bound only guards non-triviality — the parity assert below is the test
    assert bb_ref > (20.0 if mask_on else 12.0), (
        f"reference box AP too low to compare: {bb_ref}"
    )
    assert abs(bb_ref - bb_jax) <= 0.3, results
    if mask_on:
        sg_ref, sg_jax = results["segm"]
        assert abs(sg_ref - sg_jax) <= 0.3, results


def test_train_loss_parity():
    """TRAINING-side loss parity: the reference Mask R-CNN R18-FPN runs its
    train-mode forward (losses) on seeded random weights + a fixed synthetic
    GT batch, and the repo model's train-mode apply on the converted weights
    must reproduce every entry of the loss dict — pinning the loss
    normalizers (rpn.py:313-344 objectness/smooth-l1, fast_rcnn.py:144-260
    softmax-CE + box reg, mask_head.py:40-90 28x28-target BCE), exactly the
    semantics the r4 gate collapse showed can silently drift.

    Sampling determinism: both sides run with slot budgets larger than the
    candidate counts at positive fraction 1.0 (trainloss_cfg_overrides), so
    subsample_labels keeps everything and the supervised sets coincide;
    losses are order-invariant sums over those sets."""
    from tests.refkit.record import (
        IMG_SIZE,
        get_train_loss_case,
        trainloss_cfg_overrides,
    )

    from jtsm_tpu.checkpoint import convert_d2_state_dict_to_variables
    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.data.detection_utils import _crop_bitmask
    from jtsm_tpu.modeling import build_model

    rec = get_train_loss_case()

    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(
            os.path.dirname(__file__),
            "..",
            "configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml",
        )
    )
    trainloss_cfg_overrides(cfg)
    cfg.TPU.COMPUTE_DTYPE = "float32"

    nb, s = 4, IMG_SIZE
    crop_m = cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION * 4
    g = max(len(rec[f"gt_classes{i}"]) for i in range(nb))
    # static-slot sampler: the slot count must not exceed the candidate
    # count (post-NMS topk + padded gt); any budget >= candidates keeps
    # everything on both sides, and the roi losses normalize by actual
    # counts, so the differing slot constants are inert
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = (
        cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN + g
    )
    model = build_model(cfg)
    gt_boxes = np.zeros((nb, g, 4), np.float32)
    gt_classes = np.zeros((nb, g), np.int32)
    gt_valid = np.zeros((nb, g), bool)
    gt_crops = np.zeros((nb, g, crop_m, crop_m), bool)
    for i in range(nb):
        n = len(rec[f"gt_classes{i}"])
        gt_boxes[i, :n] = rec[f"gt_boxes{i}"]
        gt_classes[i, :n] = rec[f"gt_classes{i}"]
        gt_valid[i, :n] = True
        for j in range(n):
            gt_crops[i, j] = _crop_bitmask(
                rec[f"gt_masks{i}"][j].astype(bool), gt_boxes[i, j], crop_m
            )

    imgs = np.stack([rec[f"image{i}"] for i in range(nb)]).transpose(0, 2, 3, 1)
    batch = {
        "image": jnp.asarray(imgs),
        "image_sizes": jnp.asarray([[s, s]] * nb, jnp.int32),
        "orig_sizes": jnp.asarray([[s, s]] * nb, jnp.int32),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_valid": jnp.asarray(gt_valid),
        "gt_mask_crops": jnp.asarray(gt_crops),
    }
    rngs = {"params": jax.random.key(0), "sampling": jax.random.key(7)}
    template = jax.eval_shape(lambda: model.init(rngs, batch, train=True))
    sd = {k[3:]: rec[k] for k in rec if k.startswith("sd.")}
    converted, matched, unmatched = convert_d2_state_dict_to_variables(
        sd, dict(template)
    )
    assert unmatched == ["pixel_mean", "pixel_std"], unmatched[:10]
    converted = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, x.dtype)
        if isinstance(x, jax.ShapeDtypeStruct)
        else x,
        converted,
    )

    with jax.default_matmul_precision("highest"):
        losses = model.apply(
            converted, batch, train=True, rngs={"sampling": jax.random.key(7)}
        )

    ref_losses = {k[5:]: float(rec[k]) for k in rec if k.startswith("loss.")}
    assert set(ref_losses) <= set(map(str, losses)), (sorted(losses), ref_losses)
    for name, ref_v in sorted(ref_losses.items()):
        got = float(losses[name])
        tol = 2e-3 * max(abs(ref_v), 0.01) if name == "loss_mask" else 1e-4 * max(
            abs(ref_v), 0.01
        )
        assert abs(got - ref_v) < tol, (name, got, ref_v)
