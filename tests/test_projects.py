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


def test_pointrend_reference_yaml_verbatim():
    """The reference-shaped Base yaml (StandardROIHeads default +
    ROI_MASK_HEAD.NAME: PointRendMaskHead + POOLER_TYPE: "") builds the
    subdivision model (reference Base-PointRend-RCNN-FPN.yaml)."""
    from point_rend import add_pointrend_config

    import point_rend.roi_heads  # noqa: F401 (registers)

    cfg = get_cfg()
    add_pointrend_config(cfg)
    cfg.merge_from_file(
        "projects/PointRend/configs/InstanceSegmentation/Base-PointRend-RCNN-FPN.yaml"
    )
    assert cfg.MODEL.ROI_MASK_HEAD.NAME == "PointRendMaskHead"
    assert cfg.MODEL.ROI_MASK_HEAD.POOLER_TYPE == ""
    # tiny shrink
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS = 2
    cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS = 32
    cfg.MODEL.POINT_HEAD.FC_DIM = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    assert type(model.roi_heads).__name__ == "PointRendROIHeads"
    assert type(model.roi_heads.mask_head).__name__ == "PointRendMaskHead"
    assert model.roi_heads.mask_head.fc_dim == 1024
    assert model.roi_heads.mask_head.num_fc == 2
    b = 1
    batch = {
        "image": jnp.zeros((b, 64, 64, 3), jnp.float32),
        "image_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
    }
    vs = model.init({"params": jax.random.key(0), "sampling": jax.random.key(1)}, batch, train=False)
    out = model.apply(vs, batch, train=False)
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
    s2 = 4 * cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION  # deconv x2 then UP_SCALE x2
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


def test_densepose_evaluator_coco_machinery():
    """GPS AP through the full COCO per-threshold matching machinery with
    per-part normalization (reference densepose_coco_evaluation.py:318+):
    a perfect detection scores AP 100; a wrong-part detection scores 0."""
    from densepose.evaluation import DensePoseCOCOEvaluator

    from jtsm_tpu.data.catalog import DatasetCatalog

    name = "toy_densepose_eval"
    anno = {
        "bbox": [10.0, 10.0, 40.0, 40.0],  # XYWH
        "dp_x": [64.0, 128.0, 192.0],  # in 0..255 gt-box space
        "dp_y": [64.0, 128.0, 192.0],
        "dp_I": [1, 2, 3],
        "dp_U": [0.2, 0.5, 0.8],
        "dp_V": [0.3, 0.6, 0.9],
    }
    if name not in DatasetCatalog:
        DatasetCatalog.register(
            name,
            lambda: [
                {
                    "image_id": 0,
                    "height": 64,
                    "width": 64,
                    "annotations": [dict(anno)],
                }
            ],
        )

    def make_maps(correct):
        hm = wm = 32
        patch = np.zeros((hm, wm), np.int32)
        u = np.zeros((hm, wm), np.float32)
        v = np.zeros((hm, wm), np.float32)
        for k in range(3):
            # gt point k at fraction (k+1)/4 of the box
            iy = int((k + 1) / 4 * (hm - 1))
            ix = int((k + 1) / 4 * (wm - 1))
            patch[iy, ix] = anno["dp_I"][k] if correct else anno["dp_I"][k] + 10
            u[iy, ix] = anno["dp_U"][k]
            v[iy, ix] = anno["dp_V"][k]
        return patch, u, v

    for correct, want_ap in ((True, 100.0), (False, 0.0)):
        ev = DensePoseCOCOEvaluator(name, eval_mode="gps")
        ev.reset()
        patch, u, v = make_maps(correct)
        det = {"box": [10.0, 10.0, 50.0, 50.0], "score": 0.9,
               "patch_map": patch, "u_map": u, "v_map": v}
        ev.process({"image_ids": [0]}, {"densepose": [[det]]})
        res = ev.evaluate()["densepose_gps"]
        assert res["AP"] == pytest.approx(want_ap, abs=1e-6), (correct, res)


def test_densepose_evaluator_gpsm_mask_iou():
    """GPSm folds in whole-image mask IoU built from the gt dp_masks
    (reference computeDPIoU :386-392: merged 256x256 part charts scaled to
    the gt box), NOT a scatter of the sparse dp points — a dense predicted
    foreground with perfect points must reach AP 100 with a full gt mask,
    and AP 50 with a half gt mask (IoU 0.5 -> GPSm ~0.707 matches 5/10
    COCO thresholds)."""
    from densepose.evaluation import DensePoseCOCOEvaluator

    from jtsm_tpu.data.catalog import DatasetCatalog
    from jtsm_tpu.data.rle import rle_string_encode

    hm = wm = 32
    anno_base = {
        "bbox": [10.0, 10.0, 40.0, 40.0],  # XYWH
        "dp_x": [64.0, 128.0, 192.0],
        "dp_y": [64.0, 128.0, 192.0],
        "dp_I": [1, 1, 1],
        "dp_U": [0.2, 0.5, 0.8],
        "dp_V": [0.3, 0.6, 0.9],
    }
    full = np.ones((256, 256), bool)
    half = np.zeros((256, 256), bool)
    half[:, :128] = True

    patch = np.ones((hm, wm), np.int32)  # dense predicted foreground
    u = np.zeros((hm, wm), np.float32)
    v = np.zeros((hm, wm), np.float32)
    for k in range(3):
        iy = ix = int((k + 1) / 4 * (hm - 1))
        u[iy, ix] = anno_base["dp_U"][k]
        v[iy, ix] = anno_base["dp_V"][k]
    det = {"box": [10.0, 10.0, 50.0, 50.0], "score": 0.9,
           "patch_map": patch, "u_map": u, "v_map": v}

    for tag, gt_mask, want_ap in (("full", full, 100.0), ("half", half, 50.0)):
        name = f"toy_densepose_gpsm_{tag}"
        anno = dict(anno_base)
        anno["dp_masks"] = [rle_string_encode(gt_mask)] + [None] * 13
        if name not in DatasetCatalog:
            DatasetCatalog.register(
                name,
                lambda anno=anno: [
                    {"image_id": 0, "height": 64, "width": 64,
                     "annotations": [anno]}
                ],
            )
        ev = DensePoseCOCOEvaluator(name, eval_mode="gpsm")
        ev.reset()
        ev.process({"image_ids": [0]}, {"densepose": [[dict(det)]]})
        res = ev.evaluate()["densepose_gpsm"]
        assert res["AP"] == pytest.approx(want_ap, abs=1e-6), (tag, res)


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
    # reference hrfpn.py:123 names levels p1..p5 (strides 4..64)
    assert out["p1"].shape == (1, 16, 16, 32)
    assert out["p5"].shape == (1, 1, 1, 32)
    shapes = fpn.output_shape()
    assert shapes["p1"].stride == 4 and shapes["p5"].stride == 64
    # eval mode without mutable batch_stats also works (running stats)
    out2 = fpn.apply(variables, x)
    assert out2["p3"].shape == out["p3"].shape


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


def test_pointrend_semseg_head():
    """PointRendSemSegHead: coarse + point loss at train, subdivision
    refine at inference (reference point_rend/semantic_seg.py:36)."""
    from point_rend import add_pointrend_config

    import point_rend.semantic_seg  # noqa: F401 (registers)

    cfg = get_cfg()
    add_pointrend_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "SemanticSegmentor"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.SEM_SEG_HEAD.NAME = "PointRendSemSegHead"
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 4
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.MODEL.POINT_HEAD.NUM_CLASSES = 4
    cfg.MODEL.POINT_HEAD.TRAIN_NUM_POINTS = 32
    cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS = 2
    cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS = 64
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    b, h, w = 2, 64, 64
    batch = {
        "image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        "image_sizes": jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1)),
        "gt_sem_seg": jnp.asarray(rng.randint(0, 4, (b, h, w)), jnp.int32),
    }
    rngs = {"params": jax.random.key(0), "sampling": jax.random.key(1)}
    v = model.init(rngs, batch, train=True)
    losses = model.apply(v, batch, train=True, rngs={"sampling": jax.random.key(2)})
    assert "loss_sem_seg" in losses and "loss_sem_seg_point" in losses
    for k, x in losses.items():
        assert np.isfinite(float(x)), (k, x)
    out = model.apply(v, batch, train=False)
    assert out["sem_seg"].shape == (b, h, w)


def test_project_configs_load():
    """Every shipped project yaml merges cleanly after its add_*_config and
    its registered names resolve (mirrors the reference's per-project
    configs/ trees)."""
    import glob
    import os

    from deeplab import add_deeplab_config
    from panoptic_deeplab import add_panoptic_deeplab_config
    from point_rend import add_pointrend_config
    from tensormask import add_tensormask_config
    from tridentnet import add_tridentnet_config

    import point_rend.roi_heads  # noqa: F401
    import point_rend.semantic_seg  # noqa: F401
    import tensormask.arch  # noqa: F401
    import tridentnet.trident_rcnn  # noqa: F401

    sys.path.insert(0, "projects/DensePose")
    import densepose.roi_heads  # noqa: F401
    from densepose import add_densepose_config

    from jtsm_tpu.modeling.meta_arch.build import META_ARCH_REGISTRY
    from jtsm_tpu.modeling.meta_arch.semantic_seg import SEM_SEG_HEADS_REGISTRY
    from jtsm_tpu.modeling.backbone.build import BACKBONE_REGISTRY
    from jtsm_tpu.modeling.roi_heads.roi_heads import ROI_HEADS_REGISTRY

    adders = {
        "TridentNet": add_tridentnet_config,
        "DeepLab": add_deeplab_config,
        "PointRend": add_pointrend_config,
        "Panoptic-DeepLab": add_panoptic_deeplab_config,
        "TensorMask": add_tensormask_config,
        "DensePose": add_densepose_config,
    }
    n = 0
    for proj, adder in adders.items():
        for path in glob.glob(f"projects/{proj}/configs/**/*.yaml", recursive=True):
            cfg = get_cfg()
            adder(cfg)
            cfg.merge_from_file(path)
            # registered component names must resolve
            META_ARCH_REGISTRY.get(cfg.MODEL.META_ARCHITECTURE)
            if cfg.MODEL.BACKBONE.NAME != "build_resnet_backbone":
                BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)
            if cfg.MODEL.META_ARCHITECTURE in ("SemanticSegmentor", "PanopticDeepLab"):
                SEM_SEG_HEADS_REGISTRY.get(cfg.MODEL.SEM_SEG_HEAD.NAME)
            if cfg.MODEL.META_ARCHITECTURE == "GeneralizedRCNN":
                ROI_HEADS_REGISTRY.get(cfg.MODEL.ROI_HEADS.NAME)
            n += 1
    assert n >= 20, n


def test_densepose_confidence_predictor_and_loss():
    """Confidence channels + Gaussian NLL UV losses (reference
    modeling/predictors/chart_confidence.py, losses/chart_with_confidences.py)."""
    from densepose import add_densepose_config
    from densepose.modeling import (
        DensePoseChartWithConfidencePredictor,
        build_densepose_losses,
        iid_isotropic_gaussian_uv_nll,
        indep_anisotropic_gaussian_uv_nll,
    )

    pred = DensePoseChartWithConfidencePredictor(
        num_patches=24, uv_enabled=True, uv_type="indep_aniso",
        segm_enabled=True, dtype=jnp.float32,
    )
    x = jnp.zeros((2, 7, 7, 16))
    v = pred.init(jax.random.key(0), x)
    out = pred.apply(v, x)
    assert out["sigma_2"].shape == (2, 28, 28, 25)
    assert out["kappa_u"].shape == (2, 28, 28, 25)
    assert out["fine_segm_confidence"].shape == (2, 28, 28, 1)

    # NLL sanity: zero residual scores lower than large residual
    z = jnp.zeros((4,))
    lo = iid_isotropic_gaussian_uv_nll(z, z, z, z, z, 0.01)
    hi = iid_isotropic_gaussian_uv_nll(z + 1, z, z, z, z, 0.01)
    assert float(lo.sum()) < float(hi.sum())
    lo2 = indep_anisotropic_gaussian_uv_nll(z, z, z, z, z, z, z, 0.01)
    assert np.all(np.isfinite(np.asarray(lo2)))

    # registry-built loss with confidence enabled produces loss_densepose_UV
    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.ENABLED = True
    loss_fn = build_densepose_losses(cfg)
    n, p = 3, 5
    outputs = {
        k: jnp.zeros((n, 14, 14, 25)) for k in ("fine_segm", "u", "v", "sigma_2")
    }
    targets = {
        "pt_coords": jnp.full((n, p, 2), 0.5),
        "pt_patch": jnp.ones((n, p), jnp.int32),
        "pt_u": jnp.zeros((n, p)),
        "pt_v": jnp.zeros((n, p)),
        "pt_valid": jnp.ones((n, p), bool),
    }
    losses = loss_fn(outputs, targets, jnp.ones((n,)))
    assert "loss_densepose_UV" in losses and "loss_densepose_I" in losses
    assert all(np.isfinite(float(x)) for x in losses.values())


def test_densepose_deeplab_head():
    """DensePoseDeepLabHead: ASPP + nonlocal + stacked convs (reference
    modeling/roi_heads/deeplab.py)."""
    from densepose import add_densepose_config, build_densepose_head

    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NAME = "DensePoseDeepLabHead"
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 32
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DEEPLAB.NONLOCAL_ON = 1
    head = build_densepose_head(cfg)
    x = jnp.ones((2, 14, 14, 64))
    v = head.init(jax.random.key(0), x)
    y = head.apply(v, x)
    assert y.shape == (2, 14, 14, 32)
    assert np.all(np.isfinite(np.asarray(y)))


def test_densepose_cse():
    """CSE: vertex embedders + embedding predictor + embed losses (reference
    modeling/cse/, predictors/cse.py, losses/{embed,soft_embed}.py)."""
    from densepose.modeling.cse import (
        DensePoseEmbeddingPredictor,
        Embedder,
        VertexDirectEmbedder,
        embedding_loss,
        normalize_embeddings,
        soft_embedding_loss,
    )

    emb = VertexDirectEmbedder(num_vertices=10, embed_dim=4)
    v = emb.init(jax.random.key(0))
    e = emb.apply(v)
    assert e.shape == (10, 4)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=1), 1.0, atol=1e-4)

    embedder = Embedder(
        mesh_specs={
            "smpl_27554": {"TYPE": "vertex_direct", "NUM_VERTICES": 12,
                           "FEATURE_DIM": 0, "FEATURES_TRAINABLE": False},
            "cat_5001": {"TYPE": "vertex_feature", "NUM_VERTICES": 8,
                         "FEATURE_DIM": 6, "FEATURES_TRAINABLE": False},
        },
        embed_dim=4,
    )
    ve = embedder.init(jax.random.key(1))
    e1 = embedder.apply(ve, "smpl_27554")
    e2 = embedder.apply(ve, "cat_5001")
    assert e1.shape == (12, 4) and e2.shape == (8, 4)

    pred = DensePoseEmbeddingPredictor(num_coarse_segm=2, embed_dim=4, dtype=jnp.float32)
    pv = pred.init(jax.random.key(2), jnp.zeros((2, 7, 7, 16)))
    out = pred.apply(pv, jnp.zeros((2, 7, 7, 16)))
    assert out["embedding"].shape == (2, 28, 28, 4)
    assert out["coarse_segm"].shape == (2, 28, 28, 2)

    # embedding loss: matching embeddings beat mismatched ones
    mesh = np.asarray(jax.random.normal(jax.random.key(3), (8, 4)))
    mesh = np.asarray(normalize_embeddings(jnp.asarray(mesh)))
    ids = jnp.arange(6) % 8
    good = jnp.asarray(mesh)[ids] * 10.0
    bad = -good
    valid = jnp.ones((6,), bool)
    l_good = embedding_loss(good, ids, valid, jnp.asarray(mesh), 0.05)
    l_bad = embedding_loss(bad, ids, valid, jnp.asarray(mesh), 0.05)
    assert float(l_good) < float(l_bad)

    gd = jnp.asarray(np.abs(np.arange(8)[:, None] - np.arange(8)[None, :]), jnp.float32)
    l_soft = soft_embedding_loss(good, ids, valid, jnp.asarray(mesh), gd, 0.05, 4.0)
    assert np.isfinite(float(l_soft))


def test_densepose_cse_e2e():
    """CSE pipeline end-to-end: embedding predictor + embedder in the ROI
    heads, DensePoseCseLoss on vertex-id targets (reference losses/cse.py)."""
    from densepose import add_densepose_config

    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.merge_from_file("projects/DensePose/configs/cse/Base-DensePose-RCNN-FPN.yaml")
    cfg.MODEL.WEIGHTS = ""
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS["smpl_27554"]["NUM_VERTICES"] = 32
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS["smpl_27554"]["FEATURE_DIM"] = 8
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16], [32], [64], [128], [256]]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 1
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 16
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_DENSEPOSE_HEAD.FG_CAPACITY = 8
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBED_SIZE = 4
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
        "gt_dp_valid": jnp.ones((b, g, p), bool),
        "gt_dp_vertex": jnp.asarray(rng.randint(0, 32, (b, g, p)), jnp.int32),
        "gt_dp_mesh": jnp.zeros((b, g), jnp.int32),
    }
    rngs = {"params": jax.random.key(0), "sampling": jax.random.key(1)}
    variables = model.init(rngs, batch, train=True)
    losses = model.apply(
        variables, batch, train=True, rngs={"sampling": jax.random.key(2)}
    )
    assert "loss_densepose_E" in losses
    assert np.isfinite(float(losses["loss_densepose_E"]))
    out = model.apply(variables, batch, train=False)
    assert "dp_embedding" in out and out["dp_embedding"].shape[-1] == 4


def test_densepose_configs_load():
    """All shipped DensePose yamls merge + their head/predictor/loss names
    resolve in the registries."""
    import glob

    from densepose import add_densepose_config
    from densepose.modeling.heads import ROI_DENSEPOSE_HEAD_REGISTRY
    from densepose.modeling.losses import DENSEPOSE_LOSS_REGISTRY
    from densepose.modeling.predictors import DENSEPOSE_PREDICTOR_REGISTRY

    import densepose.modeling.cse  # noqa: F401 (registers CSE pieces)

    n = 0
    for path in glob.glob("projects/DensePose/configs/**/*.yaml", recursive=True):
        cfg = get_cfg()
        add_densepose_config(cfg)
        cfg.merge_from_file(path)
        dp = cfg.MODEL.ROI_DENSEPOSE_HEAD
        ROI_DENSEPOSE_HEAD_REGISTRY.get(dp.NAME or "DensePoseV1ConvXHead")
        DENSEPOSE_PREDICTOR_REGISTRY.get(dp.PREDICTOR_NAME)
        DENSEPOSE_LOSS_REGISTRY.get(dp.LOSS_NAME)
        assert dp.UV_CONFIDENCE.TYPE in ("iid_iso", "indep_aniso")
        n += 1
    assert n >= 35, n


def test_densepose_converters_and_samplers():
    """Chart-result/mask converters, hflip semantics, and bootstrapping
    samplers (reference densepose/converters/, data/samplers/)."""
    from densepose.converters import (
        DP_HFLIP_PART_SWAP,
        ToChartResultConverter,
        ToMaskConverter,
        densepose_chart_predictor_output_hflip,
    )
    from densepose.data_samplers import (
        DensePoseConfidenceBasedSampler,
        DensePoseUniformSampler,
        PredictionToGroundTruthSampler,
    )

    rng = np.random.RandomState(0)
    b, d, s = 1, 2, 8
    outputs = {
        "boxes": np.asarray([[[2, 2, 18, 26], [5, 5, 9, 9]]], np.float32),
        "scores": np.asarray([[0.9, 0.8]], np.float32),
        "classes": np.zeros((b, d), np.int64),
        "valid": np.asarray([[True, True]]),
        "dp_patch": rng.randint(0, 25, (b, d, s, s)),
        "dp_u": rng.rand(b, d, s, s).astype(np.float32),
        "dp_v": rng.rand(b, d, s, s).astype(np.float32),
        "dp_sigma": rng.rand(b, d, s, s).astype(np.float32),
    }
    results = ToChartResultConverter.convert(outputs, 0)
    assert len(results) == 2
    assert results[0]["labels"].shape == (24, 16)
    assert results[0]["uv"].shape == (2, 24, 16)
    # uv zero on background
    bg = results[0]["labels"] == 0
    assert np.all(results[0]["uv"][0][bg] == 0)

    masks = ToMaskConverter.convert(outputs, 0, (32, 32))
    assert masks.shape == (2, 32, 32)
    assert masks[:, 0, 0].sum() == 0  # outside all boxes

    flipped = densepose_chart_predictor_output_hflip(outputs)
    lut = np.arange(25)
    for a, bb in DP_HFLIP_PART_SWAP.items():
        lut[a] = bb
    np.testing.assert_array_equal(
        flipped["dp_patch"], lut[outputs["dp_patch"][..., ::-1]]
    )
    # involution: flipping twice restores the labels
    twice = densepose_chart_predictor_output_hflip(flipped)
    np.testing.assert_array_equal(twice["dp_patch"], outputs["dp_patch"])

    for sampler in (
        DensePoseUniformSampler(count_per_class=3),
        DensePoseConfidenceBasedSampler(count_per_class=3, search_count_multiplier=2.0),
    ):
        anns = sampler(outputs, 0)
        assert len(anns) == 2
        assert len(anns[0]["dp_I"]) == len(anns[0]["dp_x"]) > 0
        assert all(0 <= x <= 256 for x in anns[0]["dp_x"])

    p2g = PredictionToGroundTruthSampler()
    p2g.register_sampler("densepose", DensePoseUniformSampler(2))
    data = p2g(np.zeros((32, 32, 3), np.uint8), outputs, 0)
    assert len(data.annotations) == 2 and data.boxes_xyxy.shape == (2, 4)


def test_densepose_video_and_loaders():
    """Frame selectors, combined loader ratios, inference-based loader
    (reference densepose/data/video/, combined_loader.py)."""
    from densepose.video import (
        CombinedDataLoader,
        FirstKFramesSelector,
        InferenceBasedLoader,
        LastKFramesSelector,
        RandomKFramesSelector,
    )

    ids = list(range(10))
    assert FirstKFramesSelector(3)(ids) == [0, 1, 2]
    assert LastKFramesSelector(3)(ids) == [7, 8, 9]
    assert len(RandomKFramesSelector(4)(ids)) == 4

    l1 = [["a"]] * 5
    l2 = [["b"]] * 5
    combined = CombinedDataLoader([l1, l2], batch_size=1, ratios=[0.5, 0.5])
    batches = []
    it = iter(combined)
    for _ in range(6):
        batches.append(next(it))
    assert all(b in (["a"], ["b"]) for b in batches)

    def fake_predictor(image):
        return {
            "boxes": np.asarray([[[0, 0, 4, 4]]], np.float32),
            "scores": np.asarray([[0.9]], np.float32),
            "classes": np.zeros((1, 1), np.int64),
            "valid": np.asarray([[True]]),
        }

    loader = InferenceBasedLoader(
        fake_predictor, [[np.zeros((8, 8, 3), np.uint8)] * 3], batch_size=2
    )
    out = list(loader)
    assert sum(len(b) for b in out) == 3


def test_panoptic_deeplab_dataset_mapper(tmp_path):
    """reference projects/Panoptic-DeepLab/panoptic_deeplab/dataset_mapper.py:19 —
    panoptic PNG + segments_info -> sem_seg + center/offset targets."""
    from PIL import Image

    from panoptic_deeplab import (
        PanopticDeeplabDatasetMapper,
        add_panoptic_deeplab_config,
    )

    cfg = get_cfg()
    add_panoptic_deeplab_config(cfg)
    cfg.INPUT.MIN_SIZE_TRAIN = (32,)
    cfg.INPUT.MAX_SIZE_TRAIN = 64
    cfg.INPUT.CROP.ENABLED = False
    cfg.DATASETS.TRAIN = ("coco_2017_train_panoptic_separated",)

    h = w = 32
    # panoptic id map: segment 26001 (a "thing") fills a blob, 7 is stuff
    ids = np.full((h, w), 7, np.uint32)
    ids[8:20, 8:24] = 26001
    rgb = np.stack(
        [ids % 256, (ids // 256) % 256, ids // 256**2], -1
    ).astype(np.uint8)
    png = tmp_path / "pan.png"
    Image.fromarray(rgb).save(png)
    img_file = tmp_path / "img.png"
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(img_file)

    mapper = PanopticDeeplabDatasetMapper(
        augmentations=[],
        image_format="RGB",
        ignore_label=255,
        thing_ids=[13],
        sigma=2.0,
    )
    d = mapper(
        {
            "file_name": str(img_file),
            "pan_seg_file_name": str(png),
            "height": h,
            "width": w,
            "segments_info": [
                {"id": 26001, "category_id": 13, "iscrowd": 0},
                {"id": 7, "category_id": 0, "iscrowd": 0},
            ],
        }
    )
    assert d["sem_seg"].shape == (h, w)
    assert set(np.unique(d["sem_seg"])) == {0, 13}
    assert d["gt_center"].max() > 0.9  # gaussian peak at the blob center
    assert d["gt_offset_weight"].sum() == (12 * 16)  # thing pixels only
    # offsets point at the centroid: zero mean over the mask
    m = d["gt_offset_weight"] > 0
    assert abs(d["gt_offset"][m].mean()) < 1.0


def test_densepose_bootstrap_evolution_e2e(tmp_path):
    """Drive a REAL evolution yaml end-to-end through the bootstrap plane:
    yaml -> load_bootstrap_config normalization -> build_image_loader over a
    registered unlabeled dataset -> InferenceBasedLoader with a stub
    predictor -> PredictionToGroundTruthSampler pseudo-GT batches (reference
    densepose/engine/trainer.py build_bootstrap_loaders + the
    configs/evolution/*_B_* recipes)."""
    from PIL import Image

    from densepose import add_densepose_config
    from densepose.engine import build_bootstrap_loaders

    from jtsm_tpu.data import DatasetCatalog

    # unlabeled "chimpnsee" stand-in: plain image files on disk
    files = []
    rng = np.random.RandomState(3)
    for i in range(3):
        f = tmp_path / f"frame{i}.png"
        Image.fromarray(rng.randint(0, 255, (32, 40, 3), np.uint8)).save(f)
        files.append({"file_name": str(f)})
    name = "chimpnsee_test_stub"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda: files)

    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.merge_from_file(
        "projects/DensePose/configs/evolution/"
        "densepose_R_50_FPN_DL_WC1M_3x_Atop10P_CA.yaml"
    )
    assert len(cfg.BOOTSTRAP_DATASETS) == 1
    cfg.defrost()
    # point the bootstrap entry at the stub; image_list avoids video decode
    cfg.BOOTSTRAP_DATASETS[0]["DATASET"] = name
    cfg.BOOTSTRAP_DATASETS[0]["IMAGE_LOADER"]["TYPE"] = "image_list"

    s = 8

    def stub_predictor(image):
        r = np.random.RandomState(7)
        return {
            "boxes": np.asarray([[[2, 2, 18, 26]]], np.float32),
            "scores": np.asarray([[0.95]], np.float32),
            "classes": np.zeros((1, 1), np.int64),
            "valid": np.asarray([[True]]),
            "dp_patch": r.randint(0, 25, (1, 1, s, s)),
            "dp_u": r.rand(1, 1, s, s).astype(np.float32),
            "dp_v": r.rand(1, 1, s, s).astype(np.float32),
            "dp_sigma": r.rand(1, 1, s, s).astype(np.float32),
        }

    loaders, ratios = build_bootstrap_loaders(cfg, stub_predictor)
    assert ratios == [1.0]
    # BOOTSTRAP_DATASETS entries are normalized to full CfgNodes
    assert cfg.BOOTSTRAP_DATASETS[0].DATA_SAMPLER.TYPE == "densepose_uniform"

    batches = list(loaders[0])
    samples = [s for b in batches for s in b]
    assert len(samples) == 3  # one pseudo-GT sample per unlabeled image
    for smp in samples:
        assert smp.image.shape == (32, 40, 3)
        assert smp.boxes_xyxy.shape == (1, 4)
        ann = smp.annotations[0]
        # mined pseudo-points in DensePose's 0-255 box-relative convention
        assert len(ann["dp_x"]) > 0 and len(ann["dp_x"]) == len(ann["dp_I"])
        assert all(0 <= v <= 256 for v in ann["dp_x"] + ann["dp_y"])
        assert all(0 <= v <= 1 for v in ann["dp_U"] + ann["dp_V"])
        assert list(ann["bbox"]) == [2, 2, 16, 24]

    # FILTER.MIN_VALUE (0.8 in the yaml) drops low-score detections before
    # pseudo-GT sampling (reference data/filters ScoreBasedFilter)
    def weak_predictor(image):
        out = stub_predictor(image)
        out["scores"] = np.asarray([[0.5]], np.float32)
        return out

    loaders, _ = build_bootstrap_loaders(cfg, weak_predictor)
    weak_samples = [s for b in list(loaders[0]) for s in b]
    assert all(len(smp.boxes_xyxy) == 0 for smp in weak_samples)
