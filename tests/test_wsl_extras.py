"""WSL extras: WSL mask heads, RPNWSL (MRRP), WSJDS heads (reference:
projects/WSL/wsl/modeling/roi_heads/mask_head.py, proposal_generator/rpn.py,
seg_heads/wsjds_heads.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from jtsm_tpu.config import get_cfg
from jtsm_tpu.wsl import add_wsl_config


def test_wsl_mask_head_and_losses():
    from jtsm_tpu.wsl.modeling.mask_head_wsl import (
        MaskRCNNConvUpsampleWSLHead,
        mask_rcnn_co_loss,
        mask_rcnn_loss_wsl,
    )

    head = MaskRCNNConvUpsampleWSLHead(num_classes=5, num_conv=1, conv_dim=16)
    x = jnp.zeros((4, 7, 7, 32))
    v = head.init(jax.random.key(0), x)
    logits, feats = head.apply(v, x)
    assert logits.shape == (4, 14, 14, 5)
    assert feats.shape == (4, 14, 14, 16)

    cls = jnp.asarray([0, 1, 2, 3], jnp.int32)
    valid = jnp.ones((4,), bool)
    gt = jnp.ones((4, 14, 14))
    # logits strongly positive at the gt channel -> both losses near 0 for
    # score 1.0 and larger for score 0
    big = jnp.full((4, 14, 14, 5), -20.0)
    big = jax.vmap(lambda m, c: m.at[..., c].set(20.0))(big, cls)
    l_bce = mask_rcnn_loss_wsl(big, cls, gt, valid)
    assert float(l_bce) < 1e-3
    l_co_match = mask_rcnn_co_loss(big, cls, jnp.ones((4,)), valid)
    l_co_off = mask_rcnn_co_loss(big, cls, jnp.zeros((4,)), valid)
    assert float(l_co_match) < 0.1 < float(l_co_off)


def test_rpn_wsl_mrrp():
    from jtsm_tpu.layers import ShapeSpec
    from jtsm_tpu.wsl.modeling.rpn_wsl import RPNWSL

    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.MODEL.MRRP.MRRP_ON = True
    cfg.MODEL.MRRP.NUM_BRANCH = 2
    cfg.MODEL.RPN.IN_FEATURES = ["res4"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32]]
    rpn = RPNWSL(**RPNWSL.from_config(cfg, {"res4": ShapeSpec(channels=32, stride=16)}))

    b = 2
    feats = {"res4": jnp.ones((b * 2, 8, 8, 32))}  # branches folded into batch
    sizes = jnp.tile(jnp.asarray([[128, 128]], jnp.int32), (b, 1))
    gt_boxes = jnp.asarray([[[10.0, 10, 60, 60]]] * b)
    gt_valid = jnp.ones((b, 1), bool)
    variables = rpn.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        sizes,
        feats,
        gt_boxes,
        gt_valid,
        train=True,
    )
    props, scores, losses = rpn.apply(
        variables,
        sizes,
        feats,
        gt_boxes,
        gt_valid,
        train=True,
        rngs={"sampling": jax.random.key(2)},
    )
    assert props.shape == (b, 32, 4)
    assert np.isfinite(float(losses["loss_rpn_cls"]))
    # inference path (single branch reused across level slots)
    props_t, _, _ = rpn.apply(variables, sizes, feats, train=False)
    assert props_t.shape[0] == b


def test_sem_seg_targets_from_cpg():
    from jtsm_tpu.wsl.modeling.wsjds import sem_seg_targets_from_cpg

    cpg = np.zeros((3, 8, 8), np.float32)
    cpg[0, :4, :4] = 1.0  # strong evidence for class 0 top-left
    cpg[0, 4:, 4:] = 0.4  # ambiguous -> ignore
    labels = jnp.asarray([1.0, 0.0, 1.0])
    t, w = sem_seg_targets_from_cpg(jnp.asarray(cpg), labels, 0.7, 0.1)
    t, w = np.asarray(t), np.asarray(w)
    assert t[0, 0, 0] == 1 and w[0, 0, 0] > 0  # fg
    assert t[0, 7, 0] == 0 and w[0, 7, 0] > 0  # bg
    assert w[0, 5, 5] == 0  # ignore band
    assert t[1].max() == 0 and (w[1] > 0).all()  # absent class: all bg
    # balanced: fg weight mass == bg weight mass for class 0
    np.testing.assert_allclose((t[0] * w[0]).sum(), ((1 - t[0]) * w[0]).sum(), rtol=1e-5)


def test_wsjds_roi_heads():
    from jtsm_tpu.layers import ShapeSpec
    from jtsm_tpu.wsl.modeling.wsjds import WSJDSROIHeads

    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [64, 64]
    head = WSJDSROIHeads(
        **WSJDSROIHeads.from_config(cfg, {"res4": ShapeSpec(channels=16, stride=16)})
    )

    rng = np.random.RandomState(0)
    b, r, h, w = 2, 8, 64, 64
    feats = {"res4": jnp.asarray(rng.rand(b, 4, 4, 16), jnp.float32)}
    boxes = jnp.asarray(
        np.concatenate([rng.rand(b, r, 2) * 20, 30 + rng.rand(b, r, 2) * 30], -1),
        jnp.float32,
    )
    scores = jnp.zeros((b, r))
    sizes = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1))
    targets = {
        "gt_classes": jnp.asarray(rng.randint(0, 4, (b, 2)), jnp.int32),
        "gt_valid": jnp.ones((b, 2), bool),
        "cpg": jnp.asarray(rng.rand(b, 4, h, w), jnp.float32),
    }
    variables = head.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1), "dropout": jax.random.key(2)},
        feats,
        boxes,
        scores,
        sizes,
        targets,
        train=True,
    )
    aux, losses = head.apply(
        variables,
        feats,
        boxes,
        scores,
        sizes,
        targets,
        train=True,
        rngs={"sampling": jax.random.key(3), "dropout": jax.random.key(4)},
    )
    assert np.isfinite(float(losses["loss_cls_pos"]))
    assert np.isfinite(float(losses["loss_cls_neg"]))
    assert aux["pgt_sem_seg_binary"].shape == (b, 4, h, w)
    assert aux["pgt_sem_seg_weights"].shape == (b, 4, h, w)

    # without cpg: plain MIL loss
    t2 = {k: v for k, v in targets.items() if k != "cpg"}
    _, losses2 = head.apply(
        variables, feats, boxes, scores, sizes, t2, train=True,
        rngs={"sampling": jax.random.key(3), "dropout": jax.random.key(4)},
    )
    assert "loss_mil" in losses2

    det, _ = head.apply(
        variables, feats, boxes, scores, sizes, train=False,
        rngs={"dropout": jax.random.key(5)},
    )
    assert det["boxes"].shape[0] == b
    assert det["proposal_class_scores"].shape == (b, r, 4)


def test_wsl_iter_size_gradient_accumulation():
    """WSL.ITER_SIZE>1 wraps the optimizer in optax.MultiSteps: updates are
    zero until ITER_SIZE grads have accumulated (reference
    projects/WSL/tools/train_net.py:74-119)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "wsl_train_net", "projects/WSL/tools/train_net.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.WSL.ITER_SIZE = 2
    cfg.SOLVER.WARMUP_ITERS = 0
    params = {"dense": {"kernel": jnp.ones((3,))}}
    tx = mod.Trainer.build_optimizer(cfg, params)
    state = tx.init(params)
    g = {"dense": {"kernel": jnp.ones((3,))}}
    u1, state = tx.update(g, state, params)
    assert float(jnp.abs(u1["dense"]["kernel"]).max()) == 0.0
    u2, state = tx.update(g, state, params)
    assert float(jnp.abs(u2["dense"]["kernel"]).max()) > 0.0


def test_mrrp_wsl_resnet_backbone():
    """MRRP stage: weight-shared multi-dilation branches folded into batch
    (reference resnet_wsl_mrrp.py)."""
    import jax
    import jax.numpy as jnp

    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.layers import ShapeSpec
    from jtsm_tpu.wsl import add_wsl_config
    from jtsm_tpu.wsl.modeling.resnet_wsl import build_mrrp_wsl_resnet_backbone

    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res5"]
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.MRRP.MRRP_ON = True
    cfg.MODEL.MRRP.MRRP_STAGE = "res5"
    cfg.MODEL.MRRP.TEST_BRANCH_IDX = 1
    net = build_mrrp_wsl_resnet_backbone(cfg, ShapeSpec(channels=3))
    x = jnp.ones((2, 64, 64, 3))
    variables = net.init(jax.random.key(0), x, train=True)
    out = net.apply(variables, x, train=True)
    assert out["res5"].shape[0] == 6  # 2 images x 3 branches, batch-folded
    # branches share weights but differ numerically (different dilations)
    b0, b1 = np.asarray(out["res5"][:2]), np.asarray(out["res5"][2:4])
    assert not np.allclose(b0, b1)
    # eval keeps only TEST_BRANCH_IDX
    out_eval = net.apply(variables, x, train=False)
    assert out_eval["res5"].shape[0] == 2


def test_mrrp_vgg_backbone():
    """MRRP VGG: plain5 convs share one weight across dilated branches,
    branch outputs batch-folded (reference vgg_mrrp.py, uwsod_V_16_DC5_1x)."""
    import jax
    import jax.numpy as jnp

    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.layers import ShapeSpec
    from jtsm_tpu.wsl import add_wsl_config
    from jtsm_tpu.wsl.modeling.vgg import build_mrrp_vgg_backbone

    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.MODEL.VGG.CONV5_DILATION = 2
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.MRRP.MRRP_ON = True
    cfg.MODEL.MRRP.NUM_BRANCH = 3
    cfg.MODEL.MRRP.BRANCH_DILATIONS = [1, 2, 4]
    cfg.MODEL.MRRP.MRRP_STAGE = "plain5"
    cfg.MODEL.MRRP.TEST_BRANCH_IDX = 1
    net = build_mrrp_vgg_backbone(cfg, ShapeSpec(channels=3))
    x = jnp.ones((2, 64, 64, 3))
    variables = net.init(jax.random.key(0), x, train=True)
    out = net.apply(variables, x, train=True)
    assert out["plain5"].shape[0] == 6  # 2 images x 3 branches, batch-folded
    # dilated-stage weights are shared: exactly one conv5 kernel param set
    p5 = [k for k in variables["params"] if k.startswith("conv5_")]
    assert len(p5) == 3  # conv5_1..conv5_3, each one shared kernel
    # branches differ numerically (different dilations)
    b0, b1 = np.asarray(out["plain5"][:2]), np.asarray(out["plain5"][2:4])
    assert not np.allclose(b0, b1)
    # eval keeps only TEST_BRANCH_IDX
    out_eval = net.apply(variables, x, train=False)
    assert out_eval["plain5"].shape[0] == 2


def test_wsl_config_zoo_loads():
    """Every shipped WSL yaml merges cleanly and its head / backbone /
    proposal-generator names resolve (mirrors the reference's
    projects/WSL/configs tree)."""
    import glob

    import jtsm_tpu.wsl  # noqa: F401 (registers everything)
    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.modeling.backbone.build import BACKBONE_REGISTRY
    from jtsm_tpu.modeling.meta_arch.build import META_ARCH_REGISTRY
    from jtsm_tpu.modeling.proposal_generator.rpn import PROPOSAL_GENERATOR_REGISTRY
    from jtsm_tpu.modeling.roi_heads.roi_heads import ROI_HEADS_REGISTRY
    from jtsm_tpu.wsl import add_wsl_config

    n = 0
    for path in glob.glob("projects/WSL/configs/**/*.yaml", recursive=True):
        cfg = get_cfg()
        add_wsl_config(cfg)
        cfg.merge_from_file(path)
        META_ARCH_REGISTRY.get(cfg.MODEL.META_ARCHITECTURE)
        BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)
        ROI_HEADS_REGISTRY.get(cfg.MODEL.ROI_HEADS.NAME)
        if cfg.MODEL.PROPOSAL_GENERATOR.NAME != "PrecomputedProposals":
            PROPOSAL_GENERATOR_REGISTRY.get(cfg.MODEL.PROPOSAL_GENERATOR.NAME)
        n += 1
    assert n >= 40, n


def test_reference_literal_backbone_names_resolve():
    """The reference tree ships two yamls whose BACKBONE.NAME is never
    defined upstream (wsddn_R_18_DC5_1x.yaml -> build_resnet_18_backbone,
    reg_all/oicr_TRD_WSR_50_DC5_1x.yaml -> build_wsl_mrrp_resnet_backbone,
    a transposition of build_mrrp_wsl_resnet_backbone); here the literal
    names resolve to the intended builders so those configs load verbatim."""
    import jtsm_tpu.wsl  # noqa: F401
    from jtsm_tpu.layers import ShapeSpec
    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.modeling.backbone.build import BACKBONE_REGISTRY, build_backbone
    from jtsm_tpu.wsl import add_wsl_config

    for name in ("build_resnet_18_backbone", "build_wsl_mrrp_resnet_backbone"):
        BACKBONE_REGISTRY.get(name)

    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.MODEL.BACKBONE.NAME = "build_resnet_18_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.RES5_DILATION = 2
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res5"]
    bb = build_backbone(cfg, ShapeSpec(channels=3))
    assert bb.depth == 18


def test_csc_oicr_heads():
    """CSCOICRROIHeads: CSC-weighted MIL base loss + OICR refinement
    (reference roi_heads_csc.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import jtsm_tpu.wsl  # noqa: F401
    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.modeling.roi_heads.roi_heads import ROI_HEADS_REGISTRY
    from jtsm_tpu.layers import ShapeSpec
    from jtsm_tpu.wsl import add_wsl_config

    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res5"]
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 4
    cfg.WSL.REFINE_NUM = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cls_ = ROI_HEADS_REGISTRY.get("CSCOICRROIHeads")
    heads = cls_(**cls_.from_config(cfg, {"res5": ShapeSpec(channels=16, stride=16)}))

    rng = np.random.RandomState(0)
    b, r, hh = 2, 8, 8
    feats = {"res5": jnp.asarray(rng.rand(b, hh, hh, 16), jnp.float32)}
    proposals = jnp.asarray(
        np.concatenate([rng.rand(b, r, 2) * 40, 60 + rng.rand(b, r, 2) * 40], -1),
        jnp.float32,
    )
    scores = jnp.zeros((b, r))
    sizes = jnp.full((b, 2), 128, jnp.int32)
    targets = {
        "gt_classes": jnp.asarray(rng.randint(0, 4, (b, 3)), jnp.int32),
        "gt_valid": jnp.ones((b, 3), bool),
        "cpg": jnp.asarray(rng.rand(b, 4, 128, 128), jnp.float32),
    }
    rngs3 = {"params": jax.random.key(0), "sampling": jax.random.key(1),
             "dropout": jax.random.key(3)}
    variables = heads.init(
        rngs3, feats, proposals, scores, sizes, targets, train=True,
    )
    _, losses = heads.apply(
        variables, feats, proposals, scores, sizes, targets, train=True,
        rngs={"sampling": jax.random.key(2), "dropout": jax.random.key(4)},
    )
    assert "loss_cls_pos" in losses and "loss_cls_neg" in losses
    assert all(np.isfinite(float(v)) for v in losses.values())
    # without cpg: falls back to plain MIL loss
    t2 = {k: v for k, v in targets.items() if k != "cpg"}
    _, losses2 = heads.apply(
        variables, feats, proposals, scores, sizes, t2, train=True,
        rngs={"sampling": jax.random.key(2), "dropout": jax.random.key(4)},
    )
    assert "loss_mil" in losses2


def test_csc_constraint():
    """Reference wsl/layers/csc.py:102-140 _CSCConstraint: forward scales by
    the clamped weight; backward treats the weight as a constant."""
    from jtsm_tpu.wsl.ops import csc_constraint

    x = jnp.asarray([1.0, 2.0, 3.0])
    w = jnp.asarray([0.5, -0.25, 0.0])
    np.testing.assert_allclose(
        csc_constraint(x, w, polar=True), [0.5, 0.0, 0.0]
    )
    np.testing.assert_allclose(
        csc_constraint(x, w, polar=False), [0.0, 0.5, 0.0]
    )
    # grad flows to x scaled by clamped w; none to w
    gx, gw = jax.grad(lambda a, b: csc_constraint(a, b, True).sum(), (0, 1))(x, w)
    np.testing.assert_allclose(gx, [0.5, 0.0, 0.0])
    np.testing.assert_allclose(gw, [0.0, 0.0, 0.0])


def test_csc_statistic_writer():
    """Reference third_party/cpg_stats.py Statistic: per-class accumulation
    of label / pred / CSC-proposal counters."""
    from jtsm_tpu.wsl.stats import CSCStatistic

    st = CSCStatistic(max_iter=10, tau=0.5, num_classes=3, log_period=1)
    labels = np.asarray([[1, 0, 1]], np.float32)
    preds = np.asarray([[0.9, 0.9, 0.1]], np.float32)
    csc_out = {
        "pos_weight": np.asarray([[[1.0, 0.0], [0.0, 0.0], [0.0, 0.0]]]),
        "neg_weight": np.asarray([[[0.0, 0.5], [0.0, 0.0], [0.0, 1.0]]]),
        "valid": np.asarray([[True, True]]),
    }
    st.update(labels, preds, csc_out)
    np.testing.assert_allclose(st.label, [1, 0, 1])
    np.testing.assert_allclose(st.pred, [1, 0, 0])  # masked by label
    np.testing.assert_allclose(st.num_roi, [2, 0, 2])
    np.testing.assert_allclose(st.roi_pos, [1, 0, 0])
    np.testing.assert_allclose(st.roi_neg, [1, 0, 1])
    np.testing.assert_allclose(st.roi_zero, [0, 0, 1])
    st.write()  # smoke: logs without error


def test_mil_image_loss_mean_vs_sum():
    from jtsm_tpu.wsl.modeling.mil_heads import mil_image_loss

    scores = jnp.asarray(np.random.RandomState(0).rand(6, 5) * 0.1, jnp.float32)
    labels = jnp.asarray([1.0, 0.0, 1.0, 0.0, 0.0])
    l_mean = float(mil_image_loss(scores, labels, mean_loss=True))
    l_sum = float(mil_image_loss(scores, labels, mean_loss=False))
    np.testing.assert_allclose(l_sum, l_mean * 5, rtol=1e-6)


def test_gam_layer_and_wsddn_gam():
    """WSL.HAS_GAM (reference fast_rcnn.py:2027 GAMOutputLayers): the
    attention conv rescales features by (1 + sigmoid(a)) and a second conv
    GAP-pools to image logits trained with BCE."""
    from jtsm_tpu.layers import ShapeSpec
    from jtsm_tpu.wsl.modeling.mil_heads import GAMLayer, gam_image_loss
    from jtsm_tpu.wsl.modeling.roi_heads_wsl import WSDDNROIHeads

    gam = GAMLayer(num_classes=4)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 16), jnp.float32)
    v = gam.init(jax.random.key(0), x)
    attended, logits = gam.apply(v, x)
    assert attended.shape == x.shape
    assert logits.shape == (2, 4)
    # attention in (1, 2) x feature: attended / x within those bounds
    ratio = np.asarray(attended) / np.asarray(x)
    assert (ratio >= 1.0 - 1e-5).all() and (ratio <= 2.0 + 1e-5).all()
    assert np.isfinite(float(gam_image_loss(logits, jnp.asarray([[1.0, 0, 0, 1], [0, 1, 0, 0]]))))

    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
    cfg.WSL.HAS_GAM = True
    head = WSDDNROIHeads(
        **WSDDNROIHeads.from_config(cfg, {"res4": ShapeSpec(channels=16, stride=16)})
    )
    rng = np.random.RandomState(1)
    b, r = 2, 8
    feats = {"res4": jnp.asarray(rng.rand(b, 4, 4, 16), jnp.float32)}
    boxes = jnp.asarray(
        np.concatenate([rng.rand(b, r, 2) * 20, 30 + rng.rand(b, r, 2) * 30], -1),
        jnp.float32,
    )
    scores = jnp.zeros((b, r))
    sizes = jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1))
    targets = {
        "gt_classes": jnp.asarray(rng.randint(0, 4, (b, 2)), jnp.int32),
        "gt_valid": jnp.ones((b, 2), bool),
    }
    variables = head.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, boxes, scores, sizes, targets, train=True,
    )
    _, losses = head.apply(
        variables, feats, boxes, scores, sizes, targets, train=True,
        rngs={"dropout": jax.random.key(2)},
    )
    assert "loss_gam" in losses and np.isfinite(float(losses["loss_gam"]))


def test_aspp_binary_loss_modes():
    """ASPPHead det->seg supervision (reference seg_heads.py:126-138):
    per-class weighted BCE by default; MASK_SOFTMAX adds a background
    channel and switches to softmax CE."""
    from jtsm_tpu.layers import ShapeSpec
    from jtsm_tpu.wsl.modeling.seg_heads import ASPPHead

    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 3
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["res4"]
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 16
    shape = {"res4": ShapeSpec(channels=8, stride=16)}

    rng = np.random.RandomState(0)
    feats = {"res4": jnp.asarray(rng.rand(2, 8, 8, 8), jnp.float32)}
    bt = jnp.asarray((rng.rand(2, 3, 8, 8) > 0.5), jnp.float32)
    bw = jnp.asarray(rng.rand(2, 3, 8, 8), jnp.float32)

    for softmax in (False, True):
        cfg.MODEL.SEM_SEG_HEAD.MASK_SOFTMAX = softmax
        head = ASPPHead(**ASPPHead.from_config(cfg, shape))
        v = head.init(
            {"params": jax.random.key(0)}, feats, None,
            train=True, binary_targets=bt, binary_weights=bw,
        )
        logits, losses = head.apply(
            v, feats, None, train=True, binary_targets=bt, binary_weights=bw
        )
        assert logits.shape[-1] == (4 if softmax else 3)
        assert np.isfinite(float(losses["loss_sem_seg"]))
        assert float(losses["loss_sem_seg"]) > 0


def test_wsjds_seg_branch_end_to_end():
    """WSJDS with its own ASPP seg branch (reference wsjds_heads.py:414-469):
    train adds loss_sem_seg + the 0.1-weighted seg->det feedback CSC pair;
    inference emits full-image instance masks with no_paste flags."""
    from jtsm_tpu.layers import ShapeSpec
    from jtsm_tpu.wsl.modeling.wsjds import WSJDSROIHeads

    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
    cfg.MODEL.SEM_SEG_HEAD.NAME = "ASPPHead"
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 4
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["res4"]
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 16
    head = WSJDSROIHeads(
        **WSJDSROIHeads.from_config(cfg, {"res4": ShapeSpec(channels=16, stride=16)})
    )
    assert head.sem_seg_head is not None and head.seg_stride == 16

    rng = np.random.RandomState(0)
    b, r, h, w = 2, 8, 64, 64
    feats = {"res4": jnp.asarray(rng.rand(b, 4, 4, 16), jnp.float32)}
    boxes = jnp.asarray(
        np.concatenate([rng.rand(b, r, 2) * 20, 30 + rng.rand(b, r, 2) * 30], -1),
        jnp.float32,
    )
    scores = jnp.zeros((b, r))
    sizes = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1))
    targets = {
        "gt_classes": jnp.asarray(rng.randint(0, 4, (b, 2)), jnp.int32),
        "gt_valid": jnp.ones((b, 2), bool),
        "cpg": jnp.asarray(rng.rand(b, 4, h, w), jnp.float32),
    }
    rngs = {"params": jax.random.key(0), "sampling": jax.random.key(1), "dropout": jax.random.key(2)}
    variables = head.init(rngs, feats, boxes, scores, sizes, targets, train=True)
    aux, losses = head.apply(
        variables, feats, boxes, scores, sizes, targets, train=True,
        rngs={"sampling": jax.random.key(3), "dropout": jax.random.key(4)},
    )
    for k in ("loss_cls_pos", "loss_cls_neg", "loss_sem_seg", "loss_mask_cls_pos", "loss_mask_cls_neg"):
        assert k in losses and np.isfinite(float(losses[k])), k
    assert aux["pgt_sem_seg_binary"].shape == (b, 4, h, w)

    det, _ = head.apply(
        variables, feats, boxes, scores, sizes, train=False,
        rngs={"dropout": jax.random.key(5)},
    )
    d = det["boxes"].shape[1]
    assert det["masks_full"].shape == (b, d, 64, 64)
    assert det["no_paste"].shape == (b, d)
    # each mask is zero outside its detection box window
    m0 = np.asarray(det["masks_full"][0, 0])
    x0, y0, x1, y1 = np.asarray(det["boxes"][0, 0])
    outside = m0.copy()
    outside[int(np.floor(y0)) : int(np.ceil(y1)), int(np.floor(x0)) : int(np.ceil(x1))] = 0
    assert outside.max() == 0


def test_mrrp_wsddn_and_wsres5_registered():
    from jtsm_tpu.layers import ShapeSpec
    from jtsm_tpu.modeling.roi_heads.roi_heads import ROI_HEADS_REGISTRY
    from jtsm_tpu.wsl.modeling.roi_heads_wsl import MRRPWSDDNROIHeads

    assert ROI_HEADS_REGISTRY.get("WSRes5ROIHeads") is not None
    assert ROI_HEADS_REGISTRY.get("MRRPWSDDNROIHeads") is MRRPWSDDNROIHeads

    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
    cfg.MODEL.MRRP.MRRP_ON = True
    cfg.MODEL.MRRP.NUM_BRANCH = 3
    head = MRRPWSDDNROIHeads(
        **MRRPWSDDNROIHeads.from_config(cfg, {"res4": ShapeSpec(channels=16, stride=16)})
    )
    rng = np.random.RandomState(0)
    b, r = 2, 8
    # branch-folded features: (B*N, H, W, C)
    feats = {"res4": jnp.asarray(rng.rand(b * 3, 4, 4, 16), jnp.float32)}
    boxes = jnp.asarray(
        np.concatenate([rng.rand(b, r, 2) * 20, 30 + rng.rand(b, r, 2) * 30], -1),
        jnp.float32,
    )
    scores = jnp.zeros((b, r))
    sizes = jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1))
    targets = {
        "gt_classes": jnp.asarray(rng.randint(0, 4, (b, 2)), jnp.int32),
        "gt_valid": jnp.ones((b, 2), bool),
    }
    variables = head.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, boxes, scores, sizes, targets, train=True,
    )
    _, losses = head.apply(
        variables, feats, boxes, scores, sizes, targets, train=True,
        rngs={"dropout": jax.random.key(2)},
    )
    assert np.isfinite(float(losses["loss_mil"]))


def test_uwsod_cls_agnostic_bbox_known():
    """WSL.CLS_AGNOSTIC_BBOX_KNOWN (reference roi_heads_uwsod.py:1292):
    regression targets fall back to the proposal itself (identity deltas)."""
    from jtsm_tpu.layers import ShapeSpec
    from jtsm_tpu.wsl.modeling.wsod_zoo import UWSODROIHeads

    def build(known):
        cfg = get_cfg()
        add_wsl_config(cfg)
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
        cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
        cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
        cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
        cfg.WSL.CLS_AGNOSTIC_BBOX_KNOWN = known
        return UWSODROIHeads(
            **UWSODROIHeads.from_config(cfg, {"res4": ShapeSpec(channels=16, stride=16)})
        )

    rng = np.random.RandomState(0)
    b, r = 2, 8
    feats = {"res4": jnp.asarray(rng.rand(b, 4, 4, 16), jnp.float32)}
    boxes = jnp.asarray(
        np.concatenate([rng.rand(b, r, 2) * 20, 30 + rng.rand(b, r, 2) * 30], -1),
        jnp.float32,
    )
    scores = jnp.zeros((b, r))
    sizes = jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1))
    targets = {
        "gt_classes": jnp.asarray(rng.randint(0, 4, (b, 2)), jnp.int32),
        "gt_valid": jnp.ones((b, 2), bool),
    }
    outs = {}
    for known in (False, True):
        head = build(known)
        variables = head.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            feats, boxes, scores, sizes, targets, train=True,
        )
        _, losses = head.apply(
            variables, feats, boxes, scores, sizes, targets, train=True,
            rngs={"dropout": jax.random.key(2)},
        )
        outs[known] = losses
    # same cls losses (same params/rngs), different reg target
    np.testing.assert_allclose(
        float(outs[False]["loss_refine_cls0"]), float(outs[True]["loss_refine_cls0"]), rtol=1e-6
    )
    assert float(outs[False]["loss_refine_reg0"]) != float(outs[True]["loss_refine_reg0"])


def test_vis_test_dump(tmp_path):
    """WSL.VIS_TEST: the WSL trainer's on_test_outputs hook dumps detection
    visualizations to OUTPUT_DIR/vis_test."""
    import importlib.util
    import os as _os
    import sys as _sys

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    path = _os.path.join(repo, "projects/WSL/tools/train_net.py")
    spec = importlib.util.spec_from_file_location("wsl_train_net_vis", path)
    mod = importlib.util.module_from_spec(spec)
    _sys.modules["wsl_train_net_vis"] = mod
    spec.loader.exec_module(mod)
    Trainer = mod.Trainer

    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.WSL.VIS_TEST = True
    batch = {"image": np.full((1, 32, 32, 3), 128.0, np.float32)}
    outputs = {
        "boxes": np.asarray([[[4.0, 4, 20, 20]]]),
        "scores": np.asarray([[0.9]]),
        "classes": np.asarray([[0]]),
        "valid": np.asarray([[True]]),
    }
    Trainer._vis_test_dumped = 0
    Trainer.on_test_outputs(cfg, batch, outputs, "toy_ds")
    files = _os.listdir(str(tmp_path / "vis_test"))
    assert files == ["toy_ds_0000.png"]
    # off: no new dumps
    cfg.WSL.VIS_TEST = False
    Trainer.on_test_outputs(cfg, batch, outputs, "toy_ds")
    assert len(_os.listdir(str(tmp_path / "vis_test"))) == 1
