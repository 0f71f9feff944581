"""Rotated detection suite: rotated ROIAlign, RRPN, RROIHeads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jtsm_tpu.modeling.proposal_generator.rrpn  # noqa: F401
import jtsm_tpu.modeling.roi_heads.rotated_fast_rcnn  # noqa: F401
from jtsm_tpu.config import get_cfg
from jtsm_tpu.modeling import build_model
from jtsm_tpu.ops.roi_align import roi_align_batched
from jtsm_tpu.ops.roi_align_rotated import roi_align_rotated_batched


def test_rotated_roi_align_zero_angle_matches_axis_aligned():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(1, 24, 24, 8).astype(np.float32))
    # xyxy box (4, 6) - (16, 18) == rotated (10, 12, 12, 12, 0)
    xyxy = jnp.asarray([[4.0, 6.0, 16.0, 18.0]])
    rot = jnp.asarray([[10.0, 12.0, 12.0, 12.0, 0.0]])
    bidx = jnp.asarray([0], jnp.int32)
    a = roi_align_batched(feat, xyxy, bidx, 7, 1.0, 2, True)
    b = roi_align_rotated_batched(feat, rot, bidx, 7, 1.0, 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_rotated_roi_align_90deg_is_transposed():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.rand(1, 32, 32, 4).astype(np.float32))
    bidx = jnp.asarray([0], jnp.int32)
    box0 = jnp.asarray([[16.0, 16.0, 12.0, 12.0, 0.0]])
    box90 = jnp.asarray([[16.0, 16.0, 12.0, 12.0, 90.0]])
    a = np.asarray(roi_align_rotated_batched(feat, box0, bidx, 7, 1.0, 2))
    b = np.asarray(roi_align_rotated_batched(feat, box90, bidx, 7, 1.0, 2))
    # 90-degree ccw rotation of the sampling grid -> output is a rotation of
    # the 0-degree output
    np.testing.assert_allclose(b, np.rot90(a, k=1, axes=(1, 2)), atol=1e-3)


def test_rrpn_rroi_heads_e2e():
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "RRPN"
    cfg.MODEL.RPN.IN_FEATURES = ["res4"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.MODEL.ANCHOR_GENERATOR.ANGLES = [[-90, 0, 90]]
    cfg.MODEL.ROI_HEADS.NAME = "RROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    b, g = 2, 3
    gtb = np.zeros((b, g, 5), np.float32)
    gtb[..., 0] = rng.rand(b, g) * 40 + 10
    gtb[..., 1] = rng.rand(b, g) * 40 + 10
    gtb[..., 2] = rng.rand(b, g) * 15 + 5
    gtb[..., 3] = rng.rand(b, g) * 15 + 5
    gtb[..., 4] = rng.rand(b, g) * 90 - 45
    batch = {
        "image": jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32) * 255),
        "image_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "gt_boxes": jnp.asarray(gtb),
        "gt_classes": jnp.asarray(rng.randint(0, 3, (b, g)), jnp.int32),
        "gt_valid": jnp.ones((b, g), bool),
    }
    vs = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)}, batch, train=True
    )
    losses = model.apply(vs, batch, train=True, rngs={"sampling": jax.random.key(2)})
    assert set(losses) >= {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"}
    assert all(np.isfinite(float(v)) for v in losses.values())
    out = model.apply(vs, batch, train=False)
    assert out["boxes"].shape[-1] == 5  # rotated detections
