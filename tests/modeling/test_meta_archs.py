"""E2E forward (train + eval) of every meta-architecture on tiny random data
(mirrors reference tests/modeling/test_model_e2e.py strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jtsm_tpu.config import get_cfg
from jtsm_tpu.modeling import build_model


def _base_tiny(cfg):
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.MODEL.RETINANET.NUM_CLASSES = 5
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 4
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def _fpn_tiny(cfg):
    _base_tiny(cfg)
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16], [32], [64], [128], [256]]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 64
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 32
    return cfg


def _batch(b=2, h=64, w=64, g=4, masks=False, sem_seg=False, keypoints=False):
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        "image_sizes": jnp.tile(jnp.asarray([[h - 8, w - 4]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[2 * h, 2 * w]], jnp.int32), (b, 1)),
        "gt_boxes": jnp.asarray(
            np.concatenate(
                [rng.rand(b, g, 2) * 20, 20 + rng.rand(b, g, 2) * 20], axis=-1
            ).astype(np.float32)
        ),
        "gt_classes": jnp.asarray(rng.randint(0, 5, (b, g)), jnp.int32),
        "gt_valid": jnp.asarray([[True] * (g - 1) + [False]] * b),
    }
    if masks:
        batch["gt_mask_crops"] = jnp.asarray(rng.rand(b, g, 28, 28) > 0.5)
    if sem_seg:
        batch["gt_sem_seg"] = jnp.asarray(rng.randint(0, 4, (b, h, w)), jnp.int32)
    if keypoints:
        kp = np.zeros((b, g, 17, 3), np.float32)
        kp[..., 0] = rng.rand(b, g, 17) * 30 + 5
        kp[..., 1] = rng.rand(b, g, 17) * 30 + 5
        kp[..., 2] = 2
        batch["gt_keypoints"] = jnp.asarray(kp)
    return batch


def _run(model, batch, collections=("params",)):
    rngs = {"params": jax.random.key(0), "sampling": jax.random.key(1)}
    variables = model.init(rngs, batch, train=True)
    losses = model.apply(variables, batch, train=True, rngs={"sampling": jax.random.key(2)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    out = model.apply(variables, batch, train=False)
    return losses, out


def test_retinanet():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    _base_tiny(cfg)
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.RETINANET.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    cfg.MODEL.RETINANET.NUM_CONVS = 1
    cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST = 50
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    model = build_model(cfg)
    losses, out = _run(model, _batch())
    assert set(losses) == {"loss_cls", "loss_box_reg"}
    assert out["boxes"].shape[1] == 100
    assert out["valid"].dtype == bool


def test_semantic_segmentor():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SemanticSegmentor"
    _fpn_tiny(cfg)
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    model = build_model(cfg)
    losses, out = _run(model, _batch(sem_seg=True))
    assert "loss_sem_seg" in losses
    assert out["sem_seg"].shape == (2, 64, 64)


def test_panoptic_fpn():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
    _fpn_tiny(cfg)
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    model = build_model(cfg)
    losses, out = _run(model, _batch(masks=True, sem_seg=True))
    assert "loss_sem_seg" in losses and "loss_mask" in losses and "loss_rpn_cls" in losses
    assert "sem_seg" in out and "masks" in out


def test_panoptic_combine():
    from jtsm_tpu.modeling import combine_semantic_and_instance_outputs

    h = w = 32
    masks = np.zeros((2, h, w), bool)
    masks[0, 4:12, 4:12] = True
    masks[1, 6:14, 6:14] = True  # overlaps the first
    sem = np.zeros((h, w), np.int32)
    sem[20:, :] = 2  # stuff class with big area
    pan, infos = combine_semantic_and_instance_outputs(
        masks,
        np.array([0.9, 0.8]),
        np.array([1, 2]),
        np.array([True, True]),
        sem,
        overlap_threshold=0.5,
        stuff_area_limit=100,
        instances_confidence_threshold=0.5,
    )
    thing_segs = [s for s in infos if s["isthing"]]
    stuff_segs = [s for s in infos if not s["isthing"]]
    # second mask overlaps the first by 36/64 = 0.5625 > 0.5 -> dropped
    assert len(thing_segs) == 1
    assert thing_segs[0]["category_id"] == 1
    assert len(stuff_segs) == 1
    assert pan.max() == len(infos)


def test_res5_roi_heads_c4():
    cfg = get_cfg()
    _base_tiny(cfg)
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.RPN.IN_FEATURES = ["res4"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64]]
    cfg.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 0
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 32
    model = build_model(cfg)
    losses, out = _run(model, _batch(masks=True))
    assert "loss_cls" in losses and "loss_mask" in losses
    assert "masks" in out


def test_train_on_pred_boxes():
    # reference tests/modeling/test_roi_heads.py test_StandardROIHeads_train_on_pred_boxes
    cfg = get_cfg()
    _fpn_tiny(cfg)
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_BOX_HEAD.TRAIN_ON_PRED_BOXES = True
    model = build_model(cfg)
    losses, out = _run(model, _batch(masks=True))
    assert "loss_mask" in losses and "loss_box_reg" in losses
    assert "masks" in out


def test_keypoint_rcnn():
    cfg = get_cfg()
    _fpn_tiny(cfg)
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS = (32,)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    model = build_model(cfg)
    batch = _batch(keypoints=True)
    batch["gt_classes"] = jnp.zeros_like(batch["gt_classes"])
    losses, out = _run(model, batch)
    assert "loss_keypoint" in losses
    assert out["keypoints"].shape[2:] == (17, 4)
