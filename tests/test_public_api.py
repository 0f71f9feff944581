"""The reference's public import surface resolves here (parity guard for
the names detectron2 users reach for; reference __init__ exports per
detectron2/{layers,modeling,config,data,checkpoint,solver}/__init__.py)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


def test_layers_surface():
    from jtsm_tpu.layers import (  # noqa: F401
        ASPP,
        BatchNorm2d,
        CNNBlockBase,
        Conv2d,
        ConvTranspose2d,
        DeformConv,
        DepthwiseSeparableConv2d,
        FrozenBatchNorm2d,
        Linear,
        ModulatedDeformConv,
        NaiveSyncBatchNorm,
        ROIAlign,
        ROIAlignRotated,
        ShapeSpec,
        batched_nms,
        batched_nms_rotated,
        cat,
        get_norm,
        interpolate,
        nms,
        nms_rotated,
        nonzero_tuple,
        paste_masks_in_image,
        roi_align,
        roi_align_rotated,
    )


def test_modeling_surface():
    from jtsm_tpu.modeling import (  # noqa: F401
        BaseKeypointRCNNHead,
        BaseMaskRCNNHead,
        DatasetMapperTTA,
        GeneralizedRCNNWithTTA,
        ROIHeads,
        build_rpn_head,
        detector_postprocess,
        make_stage,
        select_foreground_proposals,
    )


def test_config_data_checkpoint_solver_surface():
    from jtsm_tpu import setup_environment  # noqa: F401
    from jtsm_tpu.checkpoint import Checkpointer, DetectionCheckpointer

    assert Checkpointer is DetectionCheckpointer
    from jtsm_tpu.config import downgrade_config, upgrade_config  # noqa: F401
    from jtsm_tpu.data import samplers, transforms  # noqa: F401
    from jtsm_tpu.data.datasets import (  # noqa: F401
        get_lvis_instances_meta,
        load_voc_instances,
        register_pascal_voc,
    )
    from jtsm_tpu.solver import WarmupCosineLR, WarmupMultiStepLR  # noqa: F401


def test_warmup_schedules_reference_math():
    import math

    from jtsm_tpu.solver import WarmupCosineLR, WarmupMultiStepLR

    s = WarmupMultiStepLR(0.02, (60000, 80000), gamma=0.1, warmup_factor=0.001, warmup_iters=1000)
    # linear warmup blend at it=500: 0.001*(1-0.5)+0.5
    assert np.isclose(float(s(500)), 0.02 * (0.001 * 0.5 + 0.5), rtol=1e-5)
    assert np.isclose(float(s(1000)), 0.02, rtol=1e-6)
    assert np.isclose(float(s(60000)), 0.002, rtol=1e-6)
    assert np.isclose(float(s(80000)), 0.0002, rtol=1e-6)

    c = WarmupCosineLR(0.01, max_iters=100, warmup_iters=0)
    assert np.isclose(float(c(50)), 0.01 * 0.5 * (1 + math.cos(math.pi * 0.5)), atol=1e-7)
    assert np.isclose(float(c(0)), 0.01, rtol=1e-6)


def test_interpolate_dispatcher():
    from jtsm_tpu.layers import interpolate

    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    assert interpolate(x, scale_factor=2, mode="nearest").shape == (2, 8, 8, 3)
    assert interpolate(x, size=(7, 5), mode="bilinear").shape == (2, 7, 5, 3)
    # integer-ratio nearest matches broadcast upsampling
    up = interpolate(x, size=(8, 8), mode="nearest")
    assert bool((up[:, ::2, ::2] == x).all())


def test_roi_align_module_wrappers():
    from jtsm_tpu.layers import ROIAlign, ROIAlignRotated
    from jtsm_tpu.ops.roi_align import roi_align_batched

    feats = jnp.arange(2 * 8 * 8 * 4, dtype=jnp.float32).reshape(2, 8, 8, 4)
    rois = jnp.asarray([[0, 1, 1, 6, 6], [1, 2, 2, 7, 7]], jnp.float32)
    out = ROIAlign(3, 1.0, 2, aligned=True)(feats, rois)
    ref = roi_align_batched(
        feats, rois[:, 1:], rois[:, 0].astype(jnp.int32), 3, 1.0, 2, True
    )
    assert out.shape == (2, 3, 3, 4)
    assert np.allclose(np.asarray(out), np.asarray(ref))

    rrois = jnp.asarray([[0, 4, 4, 4, 3, 30.0]], jnp.float32)
    assert ROIAlignRotated(3, 1.0, 2)(feats, rrois).shape == (1, 3, 3, 4)


def test_rotated_nms_index_wrappers():
    from jtsm_tpu.layers import batched_nms_rotated, nms_rotated

    boxes = jnp.asarray([[5, 5, 4, 4, 0], [5, 5, 4, 4, 5], [20, 20, 4, 4, 0]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_rotated(boxes, scores, 0.5))
    assert keep[0] == 0 and 2 in keep.tolist() and 1 not in keep[keep >= 0].tolist()
    # same boxes in different classes never cross-suppress
    keep_b = np.asarray(batched_nms_rotated(boxes, scores, jnp.asarray([0, 1, 0]), 0.5))
    kept = set(keep_b[keep_b >= 0].tolist())
    assert kept == {0, 1, 2}


def test_select_foreground_proposals_mask():
    from jtsm_tpu.modeling import select_foreground_proposals

    props = {"gt_classes": jnp.asarray([0, 3, 20, -1, 5])}
    out, fg = select_foreground_proposals(props, bg_label=20)
    assert out is props
    assert np.asarray(fg).tolist() == [True, True, False, False, True]


def test_detector_postprocess_single_image():
    from jtsm_tpu.modeling import detector_postprocess

    det = {
        "boxes": jnp.asarray([[10.0, 10.0, 50.0, 50.0]]),
        "scores": jnp.asarray([0.9]),
        "classes": jnp.asarray([1]),
        "image_size": (100, 100),
    }
    out = detector_postprocess(det, 200, 300)
    assert np.allclose(np.asarray(out["boxes"][0]), [30.0, 20.0, 150.0, 100.0])


def test_dataset_mapper_tta_views():
    from jtsm_tpu.modeling import DatasetMapperTTA

    mapper = DatasetMapperTTA(min_sizes=(100, 200), max_size=400, flip=True)
    img = np.random.RandomState(0).rand(50, 80, 3).astype(np.float32)
    views = mapper({"image": img, "height": 50, "width": 80})
    assert len(views) == 4  # 2 scales x (id, flip)
    assert views[0]["image"].shape[0] == 100  # short edge resized
    assert views[1]["flipped"] and not views[0]["flipped"]
    assert np.allclose(views[1]["image"], views[0]["image"][:, ::-1])


def test_transforms_aliases_and_apply_augmentations():
    from jtsm_tpu.data.transforms import (
        Augmentation,
        AugInput,
        ResizeShortestEdge,
        StandardAugInput,
        TransformGen,
        apply_augmentations,
        apply_transform_gens,
    )

    assert TransformGen is Augmentation and StandardAugInput is AugInput
    assert apply_transform_gens is apply_augmentations
    img = np.zeros((64, 80, 3), np.uint8)
    out, tfms = apply_augmentations([ResizeShortestEdge([32, 32], 64)], img)
    assert out.shape[0] == 32
    inp = AugInput(img, boxes=np.asarray([[0.0, 0.0, 10.0, 10.0]]))
    inp2, _ = apply_augmentations([ResizeShortestEdge([32, 32], 64)], inp)
    assert inp2 is inp and inp.image.shape[0] == 32 and inp.boxes[0, 2] == 5.0


def test_operator_count_wrappers():
    from jtsm_tpu.utils.analysis import (
        activation_count_operators,
        flop_count_operators,
    )
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, batch, train=False):
            x = nn.Conv(4, (3, 3))(batch["image"])
            return nn.Dense(2)(x.mean(axis=(1, 2)))

        def init(self, rngs, batch, train=False):
            return nn.Module.init(self, rngs["params"], batch, train=train)

        def apply(self, variables, batch, train=False):
            return nn.Module.apply(self, variables, batch, train=train)

    batch = {"image": jnp.zeros((1, 8, 8, 3), jnp.float32)}
    f = flop_count_operators(Tiny(), batch)
    a = activation_count_operators(Tiny(), batch)
    # conv: 2 * (1*8*8*4) * (3*3*3) MACs; dense: 2 * (1*2) * 4
    assert abs(f["conv"] - 2 * 8 * 8 * 4 * 27 / 1e9) < 1e-12
    assert abs(f["dot"] - 2 * 2 * 4 / 1e9) < 1e-12
    assert a["conv"] > 0 and a["dot"] > 0


def test_wsl_surface():
    import jtsm_tpu.wsl as wsl

    for n in (
        "build_mrrp_vgg_backbone",
        "build_mrrp_wsl_resnet_backbone",
        "build_vgg_backbone",
        "build_wsl_resnet_backbone",
        "build_wsl_resnet_v2_backbone",
    ):
        assert hasattr(wsl, n), n
    from jtsm_tpu.wsl.modeling import (  # noqa: F401
        CSCROIHeads,
        DatasetMapperTTAAVG,
        DatasetMapperTTAUNION,
        GeneralizedRCNNWithTTAAVG,
        GeneralizedRCNNWithTTAUNION,
        JTSMROIHeads,
        OICRROIHeads,
        PCLROIHeads,
        RPNWSL,
        TwoClassHead,
        WSDDNROIHeads,
        WSJDSROIHeads,
        detector_postprocess,
    )
    from jtsm_tpu.wsl import ops

    assert ops.crf is ops.crf_mean_field
    assert ops.pcl_loss is ops.pcl_losses
    assert callable(ops.csc) and callable(ops.roi_merge)


def test_dataset_mapper_tta_avg_proposals():
    from jtsm_tpu.wsl.modeling import DatasetMapperTTAAVG

    mapper = DatasetMapperTTAAVG(min_sizes=(100,), max_size=400, flip=True)
    img = np.zeros((50, 80, 3), np.float32)
    props = np.asarray([[0.0, 0.0, 40.0, 25.0]], np.float32)
    sp = np.arange(50 * 80, dtype=np.int32).reshape(50, 80)
    views = mapper({"image": img, "proposals": props, "superpixels": sp})
    assert len(views) == 2
    v0, v1 = views
    sx = v0["image"].shape[1] / 80.0
    sy = v0["image"].shape[0] / 50.0
    assert np.allclose(v0["proposals"][0], [0, 0, 40 * sx, 25 * sy])
    ww = v1["image"].shape[1]
    assert np.allclose(v1["proposals"][0], [ww - 40 * sx, 0, ww, 25 * sy])
    assert v0["superpixels"].shape == v0["image"].shape[:2]
    assert np.array_equal(v1["superpixels"], v0["superpixels"][:, ::-1])
