"""Model-level numeric parity of the WSL/JTSM plane against the REFERENCE
torch implementation (tests/refkit/record_wsl.py runs the reference
JTSMROIHeads — compiled reference CPU ops + the fork's own python heads —
through its exact training preamble and ``_forward_box``).

Pinned stage-by-stage on the reference's own inputs, weights converted
through the repo's own converter:

* MOIPool pooling + mask-area rescale + (objectness+1) feature scaling
  (roi_heads_jtsm.py:608-633)
* DAN box head MLP (box_head.py:19)
* TSM MIL scoring softmax_cls x softmax_det, image-level probabilities and
  the image BCE (fast_rcnn_tsm.py:573-586, :840, :346)
* per-branch OICR mining (get_pgt_top_k :1168 with pred_class_img_logits
  weights), matched per-proposal supervision, weighted CE + the
  'smooth_l1_weighted' regression loss with their batch-level normalizers
  (fast_rcnn_oicr.py:243-380)
* the END-TO-END loss dict of the repo's JTSMROIHeads module on the same
  features/proposals/labels

oh_labels are ALL-ONES in this case: the reference's CPU MOIPool kernel is
plain Caffe RoIPool (MOIPool_cpu.cpp ignores the superpixel args; only the
CUDA kernel masks), so full membership is the configuration where the CPU
reference and the masked semantics coincide. The masked binning itself
stays pinned against a transcription of the CUDA kernel in
tests/test_wsl_parity.py. The GrabCut-evidence pgt_sem_seg/mask paths are
out of numeric scope (host-side cv2; the repo's superpixel evidence is a
documented redesign) — their mining inputs are pinned here instead.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/projects/WSL"),
    reason="reference tree absent",
)

B, R, CT, CS = 2, 48, 20, 2  # images, proposals, things, stuff (incl 0)
CJ = CT + CS - 1
P = 7
STRIDE = 8


@pytest.fixture(scope="module")
def rec():
    from tests.refkit.record_wsl import get_wsl_case

    return get_wsl_case()


def _rel(ours, theirs):
    return np.abs(np.asarray(ours) - theirs).max() / (np.abs(theirs).max() + 1e-8)


def _rename_sd(rec):
    """Reference JTSM head state-dict names -> the repo module tree."""
    out = {}
    for k in rec:
        if not k.startswith("sd."):
            continue
        name = k[3:]
        name = name.replace("box_head.fc1.", "dan.dan1.")
        name = name.replace("box_head.fc2.", "dan.dan2.")
        name = name.replace("box_predictor.cls.", "mil.cls.")
        name = name.replace("box_predictor.det.", "mil.det.")
        for b in range(8):
            name = name.replace(f"box_refinery_{b}.cls_score.", f"refine{b}.refine_score.")
            name = name.replace(f"box_refinery_{b}.bbox_pred.", f"refine{b}.refine_reg.")
        out[name] = rec[k]
    return out


@pytest.fixture(scope="module")
def head_and_vars(rec):
    """The repo's JTSMROIHeads (exact-MOIPool fidelity mode, mask off) with
    the reference weights loaded through the repo converter."""
    from jtsm_tpu.checkpoint import convert_d2_state_dict_to_variables
    from jtsm_tpu.modeling.poolers import ROIPooler
    from jtsm_tpu.ops.box_regression import Box2BoxTransform
    from jtsm_tpu.wsl.modeling.roi_heads_jtsm import JTSMROIHeads

    head = JTSMROIHeads(
        num_classes=CT,
        num_classes_stuff=CS,
        in_features=("res5",),
        pooler=ROIPooler(output_size=P, scales=(1.0 / STRIDE,), sampling_ratio=0),
        refine_num=4,
        refine_reg=(True, True, True, True),
        dan_dims=(128, 128),
        box2box_transform=Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0)),
        # sp_on False: the reference's CPU MOIPool kernel ignores the
        # superpixel args (plain RoIPool — MOIPool_cpu.cpp), which is
        # exactly the head's no-superpixel roi_pool path; the masked CUDA
        # binning stays pinned at op level in tests/test_wsl_parity.py
        sp_on=False,
        dan_dropout=0.0,  # the recorder forces torch dropout to p=0
        ps_on=True,
        use_obn=True,
        mask_on=False,
        pgt_stride=1,
        mean_loss=True,
    )
    inp = _head_inputs(rec)

    def init_fn():
        features, proposals, scores, image_sizes, targets, superpixels, oh = inp
        return head.init(
            {"params": jax.random.key(0)},
            features,
            proposals,
            scores,
            image_sizes,
            targets,
            train=True,
            superpixels=superpixels,
            oh_labels=oh,
        )

    template = jax.eval_shape(init_fn)
    variables, matched, unmatched = convert_d2_state_dict_to_variables(
        _rename_sd(rec), dict(template)
    )
    assert not unmatched, unmatched[:8]
    leftovers = []

    def mat(path, x):
        if isinstance(x, jax.ShapeDtypeStruct):
            leftovers.append("/".join(map(str, path)))
            return np.zeros(x.shape, x.dtype)
        return x

    variables = jax.tree_util.tree_map_with_path(mat, variables)
    assert not leftovers, leftovers[:8]
    return head, variables, inp


def _head_inputs(rec):
    features = {"res5": jnp.asarray(np.transpose(rec["feat"], (0, 2, 3, 1)))}
    proposals = jnp.asarray(rec["prop_boxes"])
    scores = jnp.asarray(rec["prop_obj"])
    image_sizes = jnp.asarray([[128, 128]] * B, jnp.int32)
    # gt classes padded to a common G
    g = max(len(rec["gt_classes0"]), len(rec["gt_classes1"]))
    gt_classes = np.zeros((B, g), np.int32)
    gt_valid = np.zeros((B, g), bool)
    for i in range(B):
        cls = rec[f"gt_classes{i}"]
        gt_classes[i, : len(cls)] = cls
        gt_valid[i, : len(cls)] = True
    targets = {
        "gt_classes": jnp.asarray(gt_classes),
        "gt_valid": jnp.asarray(gt_valid),
        "gt_sem_seg": jnp.asarray(rec["sem_seg"]),
    }
    superpixels = jnp.asarray(rec["superpixels"])
    oh = jnp.asarray(rec["oh_labels"]).astype(bool)
    return features, proposals, scores, image_sizes, targets, superpixels, oh


# ---------------------------------------------------------------- stages
def test_sampling_preamble_is_identity(rec):
    """The WSL fork keeps every proposal in order (_sample_proposals returns
    arange — roi_heads.py:254), so the static-R JAX design needs no
    sampling stage at all; pin that assumption on the recorded case."""
    for i in range(B):
        np.testing.assert_array_equal(rec[f"sampled_boxes{i}"], rec["prop_boxes"][i])
        np.testing.assert_array_equal(rec[f"sampled_obj{i}"], rec["prop_obj"][i])


def test_roi_pool_parity(rec):
    """The repo's plain roi_pool == the reference's compiled CPU MOIPool
    kernel (which is Caffe RoIPool — MOIPool_cpu.cpp ignores the
    superpixel args), including bin validity (argmax -1)."""
    from jtsm_tpu.wsl.ops import roi_pool

    feat = jnp.asarray(np.transpose(rec["feat"], (0, 2, 3, 1)))
    pooled, valid_bins = jax.vmap(
        lambda f, bx: roi_pool(f, bx, 1.0 / STRIDE, P)
    )(feat, jnp.asarray(rec["prop_boxes"]))
    ref = np.transpose(rec["pooled"].reshape(B, R, -1, P, P), (0, 1, 3, 4, 2))
    assert _rel(pooled, ref) < 1e-5
    # bin validity == reference argmax != -1
    ref_valid = (rec["pool_argmax"].reshape(B, R, -1, P, P)[:, :, 0] != -1)
    np.testing.assert_array_equal(np.asarray(valid_bins), ref_valid)


def test_feature_scaling_parity(rec):
    """mask_scale = P^2/(nonempty+1) and (objectness+1) scaling
    (roi_heads_jtsm.py:615-633) reproduce the input the reference fed its
    box head."""
    nonempty = (rec["pool_argmax"].reshape(B, R, -1, P, P)[:, :, 0] != -1).sum((2, 3))
    mask_scale = (P * P) / (nonempty + 1.0)
    scale = mask_scale * (rec["prop_obj"] + 1.0)
    ours = rec["pooled"].reshape(B, R, -1, P, P) * scale[:, :, None, None, None]
    assert _rel(ours.reshape(B * R, -1, P, P), rec["box_features_in"]) < 1e-5


def test_dan_parity(rec, head_and_vars):
    """The DAN MLP on the reference's own (scaled) pooled features."""
    head, variables, _ = head_and_vars
    from jtsm_tpu.wsl.modeling.roi_heads_wsl import DiscriminativeAdaptionNeck

    dan = DiscriminativeAdaptionNeck(dims=(128, 128))
    x = jnp.asarray(np.transpose(rec["box_features_in"], (0, 2, 3, 1)))
    with jax.default_matmul_precision("highest"):
        out = dan.apply({"params": variables["params"]["dan"]}, x, train=False)
    assert _rel(out, rec["box_features"]) < 1e-4


def test_mil_scores_and_image_probs_parity(rec, head_and_vars):
    """TSM MIL: softmax_cls x per-image softmax_det proposal scores
    (fast_rcnn_tsm.py:573-586) and the clamped image-level probabilities
    (:840)."""
    head, variables, _ = head_and_vars
    from jtsm_tpu.wsl.modeling.mil_heads import MILOutputLayers, wsddn_scores

    mil_mod = MILOutputLayers(num_classes=CJ)
    with jax.default_matmul_precision("highest"):
        cls_l, det_l = mil_mod.apply(
            {"params": variables["params"]["mil"]}, jnp.asarray(rec["box_features"])
        )
        scores = jax.vmap(wsddn_scores)(
            cls_l.reshape(B, R, CJ), det_l.reshape(B, R, CJ), jnp.ones((B, R), bool)
        )
    assert _rel(scores.reshape(B * R, CJ), rec["mil_scores"]) < 1e-4
    img_probs = jnp.clip(scores.sum(axis=1), 1e-6, 1 - 1e-6)
    assert _rel(img_probs, rec["pred_class_img_logits"]) < 1e-4


def test_mil_image_bce_parity(rec):
    """Image BCE over the joint thing+stuff one-hots
    (fast_rcnn_tsm.py:346 via roi_heads_jtsm.py:649)."""
    from jtsm_tpu.wsl.modeling.mil_heads import mil_image_loss

    scores = jnp.asarray(rec["mil_scores"].reshape(B, R, CJ))
    labels = jnp.asarray(
        np.concatenate([rec["gt_img_oh"], rec["gt_img_oh_stuff"]], axis=1)
    )
    loss = jax.vmap(lambda m, l: mil_image_loss(m, l, True))(scores, labels).mean()
    assert abs(float(loss) - float(rec["loss.loss_cls"])) < 1e-6


def _mine_branch(rec, k, src_scores, src_boxes):
    """Repo mining chain on the reference's own branch inputs; returns
    (pgt dicts per image, sup per image)."""
    from jtsm_tpu.wsl.modeling.mil_heads import get_pgt_top_k, label_proposals_by_pgt

    img_probs = jnp.asarray(rec["pred_class_img_logits"])[:, :CT]
    labels = jnp.asarray(rec["gt_img_oh"])
    prop = jnp.asarray(rec["prop_boxes"])
    valid = jnp.ones((B, R), bool)

    def one(bx, sbx, src, v, lbl, imgw):
        pgt = get_pgt_top_k(sbx, src, v, lbl, top_k=1, img_weights=imgw)
        sup = label_proposals_by_pgt(bx, v, pgt, CT)
        return pgt, sup

    return jax.vmap(one)(prop, src_boxes, src_scores, valid, labels, img_probs)


def _branch_sources(rec):
    """Source scores/boxes per branch exactly as the reference threads them
    (MIL for branch 0, softmax + per-class decoded boxes after)."""
    from jtsm_tpu.ops.box_regression import Box2BoxTransform

    tr = Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0))
    prop = jnp.asarray(rec["prop_boxes"])
    sources = [jnp.asarray(rec["mil_scores"].reshape(B, R, CJ))[:, :, :CT]]
    boxes = [prop]
    for k in range(4):
        probs = jax.nn.softmax(
            jnp.asarray(rec[f"refine{k}_logits"].reshape(B, R, CT + 1)), axis=-1
        )[:, :, :CT]
        dl = jnp.asarray(rec[f"refine{k}_deltas"].reshape(B, R, CT * 4))
        dec = jax.vmap(
            lambda d, bx: tr.apply_deltas(
                d.reshape(-1, 4),
                jnp.broadcast_to(bx[:, None, :], (R, CT, 4)).reshape(-1, 4),
            ).reshape(R, CT, 4)
        )(dl, prop)
        sources.append(probs)
        boxes.append(dec)
    return sources, boxes


@pytest.mark.parametrize("k", range(4))
def test_refinement_mining_parity(rec, k):
    """Branch-k top-1 mining: boxes, classes, mined scores and the
    image-logit supervision weights (get_pgt_top_k :1168-1263)."""
    sources, boxes = _branch_sources(rec)
    pgt, _ = _mine_branch(rec, k, sources[k], boxes[k])
    for i in range(B):
        present = np.asarray(pgt["valid"][i, :, 0])
        ref_classes = rec[f"pgt{k}_classes{i}"]
        np.testing.assert_array_equal(np.where(present)[0], ref_classes)
        sel = np.asarray(pgt["boxes"][i, :, 0][present])
        assert _rel(sel, rec[f"pgt{k}_boxes{i}"]) < 1e-5
        assert _rel(np.asarray(pgt["score"][i, :, 0][present]), rec[f"pgt{k}_scores{i}"]) < 1e-4
        assert _rel(np.asarray(pgt["weight"][i, :, 0][present]), rec[f"pgt{k}_weights{i}"]) < 1e-4


@pytest.mark.parametrize("k", range(4))
def test_refinement_supervision_parity(rec, k):
    """Matched per-proposal labels/weights (label_and_sample_proposals with
    the [0.5] matcher) and the branch loss values with the reference's
    batch-level normalizers."""
    from jtsm_tpu.ops.box_regression import Box2BoxTransform
    from jtsm_tpu.wsl.modeling.mil_heads import (
        oicr_branch_loss_terms,
        oicr_reg_loss_sum,
    )

    sources, boxes = _branch_sources(rec)
    _, sup = _mine_branch(rec, k, sources[k], boxes[k])
    for i in range(B):
        np.testing.assert_array_equal(
            np.asarray(sup["labels"][i]), rec[f"match{k}_gt_classes{i}"]
        )
        assert _rel(np.asarray(sup["weights"][i]), rec[f"match{k}_gt_weights{i}"]) < 1e-4
        assert _rel(
            np.asarray(sup["matched_pgt_boxes"][i]), rec[f"match{k}_gt_boxes{i}"]
        ) < 1e-5

    logits = jnp.asarray(rec[f"refine{k}_logits"].reshape(B, R, CT + 1))
    deltas = jnp.asarray(rec[f"refine{k}_deltas"].reshape(B, R, CT * 4))
    tr = Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0))
    cls_sum, cls_cnt = jax.vmap(oicr_branch_loss_terms)(
        logits, sup["labels"], sup["weights"]
    )
    loss_cls = float(cls_sum.sum() / jnp.maximum(cls_cnt.sum(), 1.0))
    assert abs(loss_cls - float(rec[f"loss.loss_cls_r{k}"])) < 1e-6

    reg_sum = jax.vmap(
        lambda dl, lb, w, fg, bx, gt: oicr_reg_loss_sum(dl, lb, w, fg, bx, gt, tr)
    )(
        deltas,
        sup["labels"],
        sup["weights"],
        sup["fg"],
        jnp.asarray(rec["prop_boxes"]),
        sup["matched_pgt_boxes"],
    )
    loss_reg = float(reg_sum.sum() / (B * R))
    assert abs(loss_reg - float(rec[f"loss.loss_box_reg_r{k}"])) < 1e-6


def test_semseg_mining_inputs_parity(rec):
    """The stuff-slice top-1 mining that feeds pgt_sem_seg painting
    (get_pgt_sem_seg :2025 mines gt_classes_img_int_stuff with image-logit
    weights). The painting itself uses GrabCut evidence upstream (host
    cv2) vs superpixel unions here — a documented redesign — so only the
    mined classes/scores/weights are pinned."""
    from jtsm_tpu.wsl.modeling.mil_heads import get_pgt_top_k

    mil = jnp.asarray(rec["mil_scores"].reshape(B, R, CJ))
    img_probs = jnp.asarray(rec["pred_class_img_logits"])
    stuff_labels = np.zeros((B, CS - 1), np.float32)
    stuff_labels[:] = rec["gt_img_oh_stuff"]
    for i in range(B):
        pgt = get_pgt_top_k(
            jnp.asarray(rec["prop_boxes"][i]),
            mil[i, :, CT:],
            jnp.ones((R,), bool),
            jnp.asarray(stuff_labels[i]),
            top_k=1,
            img_weights=img_probs[i, CT:],
        )
        present = np.asarray(pgt["valid"][:, 0])
        ref_classes = rec[f"semseg_classes{i}"] - CT  # joint ids -> stuff slice
        np.testing.assert_array_equal(np.where(present)[0], ref_classes)
        if len(ref_classes):
            assert _rel(np.asarray(pgt["score"][:, 0][present]), rec[f"semseg_scores{i}"]) < 1e-4
            assert _rel(np.asarray(pgt["weight"][:, 0][present]), rec[f"semseg_weights{i}"]) < 1e-4
            assert _rel(np.asarray(pgt["boxes"][:, 0][present]), rec[f"semseg_boxes{i}"]) < 1e-5


def test_end_to_end_loss_dict_parity(rec, head_and_vars):
    """The repo's JTSMROIHeads module end-to-end on the same inputs: every
    entry of the reference loss dict within f32 tolerance."""
    head, variables, inp = head_and_vars
    features, proposals, scores, image_sizes, targets, superpixels, oh = inp
    with jax.default_matmul_precision("highest"):
        (aux, losses) = head.apply(
            variables,
            features,
            proposals,
            scores,
            image_sizes,
            targets,
            train=True,
            superpixels=superpixels,
            oh_labels=oh,
        )
    name_map = {"loss_mil": "loss_cls"}
    for k in range(4):
        name_map[f"loss_refine_cls{k}"] = f"loss_cls_r{k}"
        name_map[f"loss_refine_reg{k}"] = f"loss_box_reg_r{k}"
    for ours, ref in name_map.items():
        assert ours in losses, sorted(losses)
        ref_v = float(rec[f"loss.{ref}"])
        got = float(losses[ours])
        assert abs(got - ref_v) < max(2e-5, 2e-4 * abs(ref_v)), (ours, got, ref_v)
    # the painted pseudo sem-seg exists for the stuff head (evidence
    # redesign keeps it out of numeric scope)
    assert aux["pgt_sem_seg"].shape == (B, 128, 128)
