"""Project-plane tests: TridentNet backbone, PointRend, DeepLab heads,
Panoptic-DeepLab, TensorMask SwapAlign2Nat, DensePose head."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "projects/TridentNet")
sys.path.insert(0, "projects/PointRend")
sys.path.insert(0, "projects/DeepLab")
sys.path.insert(0, "projects/Panoptic-DeepLab")
sys.path.insert(0, "projects/TensorMask")
sys.path.insert(0, "projects/DensePose")

from jtsm_tpu.config import get_cfg
from jtsm_tpu.modeling import build_model


def test_trident_backbone():
    from tridentnet import add_tridentnet_config, build_trident_resnet_backbone

    cfg = get_cfg()
    add_tridentnet_config(cfg)
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3"]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    bb = build_trident_resnet_backbone(cfg, None)
    v = bb.init(jax.random.key(0), jnp.zeros((2, 64, 64, 3)))
    out_train = bb.apply(v, jnp.zeros((2, 64, 64, 3)), train=True)
    assert out_train["res4"].shape == (6, 4, 4, 1024)  # 3 branches x B
    out_test = bb.apply(v, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out_test["res4"].shape == (2, 4, 4, 1024)


def test_point_sample_matches_manual():
    from point_rend import point_sample

    feat = jnp.arange(16.0).reshape(1, 4, 4, 1)
    # center of pixel (1, 2) in normalized coords
    pts = jnp.asarray([[[(2 + 0.5) / 4, (1 + 0.5) / 4]]])
    out = point_sample(feat, pts)
    assert float(out[0, 0, 0]) == pytest.approx(6.0)


def test_pointrend_roi_heads():
    from point_rend import add_pointrend_config

    import point_rend.roi_heads  # noqa: F401 (registers)

    cfg = get_cfg()
    add_pointrend_config(cfg)
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16], [32], [64], [128], [256]]
    cfg.MODEL.ROI_HEADS.NAME = "PointRendROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.POINT_HEAD.TRAIN_NUM_POINTS = 16
    cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS = 2
    cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS = 32
    cfg.MODEL.POINT_HEAD.FC_DIM = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    b, g = 2, 3
    batch = {
        "image": jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32) * 255),
        "image_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "gt_boxes": jnp.asarray(
            np.concatenate([rng.rand(b, g, 2) * 20, 25 + rng.rand(b, g, 2) * 20], -1).astype(np.float32)
        ),
        "gt_classes": jnp.asarray(rng.randint(0, 3, (b, g)), jnp.int32),
        "gt_valid": jnp.ones((b, g), bool),
        "gt_mask_crops": jnp.asarray(rng.rand(b, g, 28, 28) > 0.5),
    }
    vs = model.init({"params": jax.random.key(0), "sampling": jax.random.key(1)}, batch, train=True)
    losses = model.apply(vs, batch, train=True, rngs={"sampling": jax.random.key(2)})
    assert "loss_mask" in losses and "loss_mask_point" in losses
    assert all(np.isfinite(float(v)) for v in losses.values())
    out = model.apply(vs, batch, train=False)
    # subdivision: 7 -> 14 -> 28
    assert out["masks"].shape[-1] == 28


def test_deeplab_heads():
    from deeplab import DeepLabCE, add_deeplab_config

    import deeplab.semantic_seg  # noqa: F401

    cfg = get_cfg()
    add_deeplab_config(cfg)
    cfg.MODEL.SEM_SEG_HEAD.NAME = "DeepLabV3PlusHead"
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["res2", "res5"]
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 5
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.MODEL.SEM_SEG_HEAD.ASPP_CHANNELS = 32
    cfg.MODEL.SEM_SEG_HEAD.PROJECT_CHANNELS = [16]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    from jtsm_tpu.layers import ShapeSpec
    from jtsm_tpu.modeling.meta_arch.semantic_seg import build_sem_seg_head

    head = build_sem_seg_head(
        cfg, {"res2": ShapeSpec(channels=64, stride=4), "res5": ShapeSpec(channels=128, stride=16)}
    )
    feats = {
        "res2": jnp.zeros((1, 16, 16, 64)),
        "res5": jnp.zeros((1, 4, 4, 128)),
    }
    tgt = jnp.zeros((1, 64, 64), jnp.int32)
    v = head.init({'params': jax.random.key(0), 'dropout': jax.random.key(1)}, feats, tgt, train=True)
    logits, losses = head.apply(v, feats, tgt, train=True, rngs={'dropout': jax.random.key(2)})
    assert logits.shape == (1, 16, 16, 5)
    assert "loss_sem_seg" in losses

    ce = DeepLabCE(jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 8, 8), jnp.int32))
    assert np.isfinite(float(ce))


def test_panoptic_deeplab_postprocessing():
    from panoptic_deeplab import get_panoptic_segmentation, panoptic_deeplab_targets

    h = w = 32
    masks = np.zeros((2, h, w), bool)
    masks[0, 4:12, 4:12] = True
    masks[1, 20:28, 20:28] = True
    tgt = panoptic_deeplab_targets(masks, np.array([True, True]))
    assert tgt["gt_center"].max() > 0.9
    assert tgt["gt_offset_weight"].sum() == masks.sum()

    sem = np.zeros((h, w), np.int32)
    sem[masks[0]] = 1  # thing class 1
    sem[masks[1]] = 1
    center = tgt["gt_center"]
    offset = tgt["gt_offset"]
    pan, segs = get_panoptic_segmentation(
        sem, center, offset, thing_ids={1}, stuff_area=10
    )
    thing_segs = [s for s in segs if s["isthing"]]
    assert len(thing_segs) == 2


def test_swap_align2nat():
    from tensormask import swap_align2nat

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 3, 3, 6, 6).astype(np.float32))
    out = swap_align2nat(x, lambda_val=1)
    assert out.shape == (1, 3, 3, 6, 6)
    # center offset (u=v=1 for V=3): natural == aligned
    np.testing.assert_allclose(np.asarray(out[0, 1, 1]), np.asarray(x[0, 1, 1]), atol=1e-5)
    # offset u=0 (=-1 from center): natural at y reads aligned at y+1
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 1, :5, :]), np.asarray(x[0, 0, 1, 1:, :]), atol=1e-5
    )
    out2 = swap_align2nat(x, lambda_val=2)
    assert out2.shape == (1, 3, 3, 12, 12)


def test_densepose_head():
    from densepose import DensePoseV1ConvXHead, add_densepose_config

    head = DensePoseV1ConvXHead(num_stacked_convs=2, conv_dim=32)
    x = jnp.zeros((4, 14, 14, 64))
    v = head.init(jax.random.key(0), x)
    out = head.apply(v, x)
    assert out["coarse_segm"].shape == (4, 28, 28, 2)
    assert out["fine_segm"].shape == (4, 28, 28, 25)
    assert out["u"].shape == (4, 28, 28, 25)


def test_densepose_roi_heads_e2e():
    """Full GeneralizedRCNN with the DensePose branch: train losses on dp
    point targets + inference chart maps (reference densepose/roi_head.py)."""
    import densepose  # noqa: F401 (registers DensePoseROIHeads)
    from densepose import add_densepose_config

    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16], [32], [64], [128], [256]]
    cfg.MODEL.ROI_HEADS.NAME = "DensePoseROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 1
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 16
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_DENSEPOSE_HEAD.FG_CAPACITY = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    b, g, p = 2, 3, 6
    batch = {
        "image": jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32) * 255),
        "image_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "gt_boxes": jnp.asarray(
            np.concatenate([rng.rand(b, g, 2) * 20, 25 + rng.rand(b, g, 2) * 25], -1).astype(
                np.float32
            )
        ),
        "gt_classes": jnp.zeros((b, g), jnp.int32),
        "gt_valid": jnp.ones((b, g), bool),
        "gt_dp_coords": jnp.asarray(rng.rand(b, g, p, 2), jnp.float32),
        "gt_dp_patch": jnp.asarray(rng.randint(1, 25, (b, g, p)), jnp.int32),
        "gt_dp_u": jnp.asarray(rng.rand(b, g, p), jnp.float32),
        "gt_dp_v": jnp.asarray(rng.rand(b, g, p), jnp.float32),
        "gt_dp_valid": jnp.ones((b, g, p), bool),
    }
    rngs = {"params": jax.random.key(0), "sampling": jax.random.key(1)}
    variables = model.init(rngs, batch, train=True)
    losses = model.apply(
        variables, batch, train=True, rngs={"sampling": jax.random.key(2)}
    )
    for k in ("loss_densepose_I", "loss_densepose_U", "loss_densepose_V"):
        assert k in losses and np.isfinite(float(losses[k])), (k, losses.get(k))
    out = model.apply(variables, batch, train=False)
    d = out["boxes"].shape[1]
    s2 = 2 * cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION
    assert out["dp_patch"].shape == (b, d, s2, s2)
    assert out["dp_u"].shape == (b, d, s2, s2)
    assert int(out["dp_patch"].max()) <= 24 and int(out["dp_patch"].min()) >= 0


def test_tensormask_arch():
    import tensormask.arch  # noqa: F401 (registers)
    from tensormask import add_tensormask_config

    cfg = get_cfg()
    add_tensormask_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "TensorMask"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.TENSOR_MASK.IN_FEATURES = ["p3", "p4", "p5"]
    cfg.MODEL.TENSOR_MASK.ANCHOR_SIZES = [[16], [32], [64]]
    cfg.MODEL.TENSOR_MASK.NUM_CLASSES = 3
    cfg.MODEL.TENSOR_MASK.NUM_CONVS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    b, g = 2, 3
    batch = {
        "image": jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32) * 255),
        "image_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "gt_boxes": jnp.asarray(
            np.concatenate([rng.rand(b, g, 2) * 20, 25 + rng.rand(b, g, 2) * 20], -1).astype(np.float32)
        ),
        "gt_classes": jnp.asarray(rng.randint(0, 3, (b, g)), jnp.int32),
        "gt_valid": jnp.ones((b, g), bool),
        "gt_mask_crops": jnp.asarray(rng.rand(b, g, 28, 28) > 0.5),
    }
    vs = model.init({"params": jax.random.key(0), "sampling": jax.random.key(1)}, batch, train=True)
    losses = model.apply(vs, batch, train=True, rngs={"sampling": jax.random.key(2)})
    assert set(losses) == {"loss_cls", "loss_box_reg", "loss_mask"}
    assert all(np.isfinite(float(v)) for v in losses.values())
    out = model.apply(vs, batch, train=False)
    assert out["masks"].shape[2:] == (15, 15)


def test_densepose_data_targets():
    from densepose.data import densepose_targets_from_annotations

    annos = [
        {
            "dp_x": [64.0, 128.0],
            "dp_y": [64.0, 192.0],
            "dp_I": [1, 5],
            "dp_U": [0.2, 0.7],
            "dp_V": [0.3, 0.1],
        },
        {},
    ]
    gt_boxes = np.array([[0, 0, 10, 10], [5, 5, 20, 20]], np.float32)
    t = densepose_targets_from_annotations(annos, gt_boxes, max_points=4)
    assert t["gt_dp_valid"][0].sum() == 2
    assert t["gt_dp_valid"][1].sum() == 0
    np.testing.assert_allclose(t["gt_dp_coords"][0, 0], [0.25, 0.25])
    assert t["gt_dp_patch"][0, 1] == 5


def test_densepose_gps():
    from densepose.evaluation import gps_similarity

    # exact predictions -> similarity 1
    p = np.array([1, 2, 3])
    u = np.array([0.1, 0.5, 0.9])
    v = np.array([0.2, 0.6, 0.4])
    ok = np.ones(3, bool)
    assert gps_similarity(p, u, v, p, u, v, ok) == pytest.approx(1.0)
    # wrong patch -> near zero
    s = gps_similarity(p + 1, u, v, p, u, v, ok)
    assert s < 0.01


def test_hrnet_hrfpn_backbone():
    """HRNet multi-resolution backbone + HRFPN neck output contract
    (reference densepose/modeling/hrnet.py, hrfpn.py)."""
    import jax

    from densepose import add_densepose_config, build_hrfpn_backbone
    from jtsm_tpu.layers import ShapeSpec

    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.MODEL.HRNET.STEM_INPLANES = 16
    cfg.MODEL.HRNET.STAGE2.NUM_CHANNELS = [8, 16]
    cfg.MODEL.HRNET.STAGE2.NUM_BLOCKS = [1, 1]
    cfg.MODEL.HRNET.STAGE3.NUM_MODULES = 1
    cfg.MODEL.HRNET.STAGE3.NUM_CHANNELS = [8, 16, 32]
    cfg.MODEL.HRNET.STAGE3.NUM_BLOCKS = [1, 1, 1]
    cfg.MODEL.HRNET.STAGE4.NUM_MODULES = 1
    cfg.MODEL.HRNET.STAGE4.NUM_CHANNELS = [8, 16, 32, 64]
    cfg.MODEL.HRNET.STAGE4.NUM_BLOCKS = [1, 1, 1, 1]
    cfg.MODEL.HRNET.HRFPN.OUT_CHANNELS = 32

    fpn = build_hrfpn_backbone(cfg, ShapeSpec(channels=3))
    x = jnp.zeros((1, 64, 64, 3))
    variables = fpn.init(jax.random.key(0), x)
    out, _ = fpn.apply(variables, x, mutable=["batch_stats"])
    assert out["p2"].shape == (1, 16, 16, 32)
    assert out["p6"].shape == (1, 1, 1, 32)
    shapes = fpn.output_shape()
    assert shapes["p2"].stride == 4 and shapes["p6"].stride == 64
    # eval mode without mutable batch_stats also works (running stats)
    out2 = fpn.apply(variables, x)
    assert out2["p4"].shape == out["p4"].shape


def _trident_tiny_cfg(test_branch_idx):
    from tridentnet import add_tridentnet_config

    import tridentnet.trident_rcnn  # noqa: F401 (registers RPN/heads)

    cfg = get_cfg()
    add_tridentnet_config(cfg)
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.NUM_GROUPS = 1
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 16
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.BACKBONE.NAME = "build_trident_resnet_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "TridentRPN"
    cfg.MODEL.RPN.IN_FEATURES = ["res4"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64]]
    cfg.MODEL.ROI_HEADS.NAME = "TridentRes5ROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.TRIDENT.TEST_BRANCH_IDX = test_branch_idx
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    return cfg


@pytest.mark.parametrize("test_branch_idx", [1, -1])
def test_tridentnet_e2e(test_branch_idx):
    """Full TridentNet fwd (train+eval): branch-folded batch through
    TridentRPN/TridentRes5ROIHeads; -1 exercises all-branch merge
    (reference trident_rcnn.py merge_branch_instances)."""
    from tests.modeling.test_meta_archs import _batch

    cfg = _trident_tiny_cfg(test_branch_idx)
    model = build_model(cfg)
    batch = _batch(b=2, h=64, w=64)
    rngs = {"params": jax.random.key(0), "sampling": jax.random.key(1)}
    variables = model.init(rngs, batch, train=True)
    losses = model.apply(
        variables, batch, train=True, rngs={"sampling": jax.random.key(2)}
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    out = model.apply(variables, batch, train=False)
    assert out["boxes"].shape == (2, 10, 4)
    assert out["scores"].shape == (2, 10)
