"""Visualizer drawing surface + analytic FLOP counting."""

import numpy as np
import pytest

from jtsm_tpu.utils.analysis import flop_count_analytic, parameter_count
from jtsm_tpu.utils.visualizer import Visualizer, _jitter, mask_to_polygons
from jtsm_tpu.utils.video_visualizer import VideoVisualizer


def _img(h=64, w=64):
    return np.full((h, w, 3), 128, np.uint8)


def test_draw_polygon_and_rotated_box():
    vis = Visualizer(_img())
    vis.draw_polygon([10, 10, 40, 10, 40, 40], color=(255, 0, 0))
    vis.draw_rotated_box_with_label((32, 32, 20, 10, 30.0), color=(0, 0, 255), label="r")
    out = vis.get_output().get_image()
    assert (out[..., 0] > 200).any()  # red fill landed
    assert out.shape == (64, 64, 3)


def test_jitter_deterministic_distinct():
    c0 = _jitter((0, 255, 0), seed=0)
    c1 = _jitter((0, 255, 0), seed=1)
    assert c0 == _jitter((0, 255, 0), seed=0)
    assert c0 != c1


def test_mask_polygons_and_binary_mask_edges():
    pytest.importorskip("cv2")
    mask = np.zeros((64, 64), bool)
    mask[10:30, 10:30] = True
    polys = mask_to_polygons(mask)
    assert polys and polys[0].shape[1] == 2
    vis = Visualizer(_img())
    vis.draw_binary_mask(mask, color=(0, 255, 0), text="obj")
    assert (vis.get_output().get_image()[..., 1] > 150).any()


def test_draw_dataset_dict_polygons_keypoints():
    from jtsm_tpu.structures import BoxMode

    dic = {
        "annotations": [
            {
                "bbox": [5, 5, 20, 20],
                "bbox_mode": BoxMode.XYWH_ABS,
                "category_id": 1,
                "segmentation": [[5, 5, 25, 5, 25, 25]],
                "keypoints": [10, 10, 2, 15, 15, 2],
            },
            {
                "bbox": [32, 32, 16, 8, 45.0],
                "bbox_mode": BoxMode.XYWHA_ABS,
                "category_id": 2,
            },
        ]
    }
    vis = Visualizer(_img())
    out = vis.draw_dataset_dict(dic).get_image()
    assert out.shape == (64, 64, 3)
    assert not np.all(out == 128)  # something was drawn


def test_overlay_instances_masks_only():
    masks = [np.pad(np.ones((10, 10), bool), ((5, 49), (5, 49)))]
    vis = Visualizer(_img())
    vis.overlay_instances(masks=masks, labels=["thing"])
    assert not np.all(vis.get_output().get_image() == 128)


def test_video_visualizer_identity_and_masks():
    vv = VideoVisualizer()
    preds1 = {
        "boxes": np.asarray([[5.0, 5.0, 20.0, 20.0], [40.0, 40.0, 60.0, 60.0]]),
        "scores": np.asarray([0.9, 0.8]),
        "classes": np.asarray([0, 1]),
        "valid": np.asarray([True, True]),
        "masks": np.ones((2, 28, 28), np.float32),
    }
    vv.draw_instance_predictions(_img(), preds1)
    colors1 = [i.color for i in vv._old_instances]
    # frame 2: same objects shifted slightly -> colors must persist
    preds2 = {k: v.copy() for k, v in preds1.items()}
    preds2["boxes"] = preds2["boxes"] + 1.0
    vv.draw_instance_predictions(_img(), preds2)
    assert [i.color for i in vv._old_instances[:2]] == colors1


def test_video_visualizer_label_gate_and_ttl():
    """Color transfer requires SAME label (reference video_visualizer.py:208);
    a missed detection survives as a ttl ghost and reclaims its color when it
    reappears (reference :223-227)."""
    vv = VideoVisualizer(ttl=3)
    box_a = np.asarray([[5.0, 5.0, 20.0, 20.0]])
    frame = {
        "boxes": box_a,
        "scores": np.asarray([0.9]),
        "classes": np.asarray([0]),
        "valid": np.asarray([True]),
    }
    vv.draw_instance_predictions(_img(), frame)
    color_a = vv._old_instances[0].color
    # same box, DIFFERENT label -> must get a new color
    frame2 = dict(frame, classes=np.asarray([1]))
    vv.draw_instance_predictions(_img(), frame2)
    assert vv._old_instances[0].color != color_a
    # the class-0 ghost is still alive (ttl): class-0 box reappears -> color_a
    frame3 = dict(frame, classes=np.asarray([0]))
    vv.draw_instance_predictions(_img(), frame3)
    assert vv._old_instances[0].color == color_a


def test_video_visualizer_panoptic_tracking():
    """Thing segments in panoptic video keep their color across frames via
    mask-bbox IoU tracking (reference draw_panoptic_seg_predictions :124)."""
    vv = VideoVisualizer()
    pan = np.zeros((64, 64), np.int64)
    pan[5:20, 5:20] = 7  # thing
    pan[40:60, 40:60] = 3  # stuff
    info = [
        {"id": 7, "isthing": True, "category_id": 0},
        {"id": 3, "isthing": False, "category_id": 0},
    ]
    out1 = vv.draw_panoptic_seg_predictions(_img(), pan, info)
    assert out1.get_image().shape == (64, 64, 3)
    color1 = vv._old_instances[0].color
    pan2 = np.roll(pan, 2, axis=1)  # slight motion
    vv.draw_panoptic_seg_predictions(_img(), pan2, info)
    assert vv._old_instances[0].color == color1


def test_flop_count_analytic_known_values():
    import jax.numpy as jnp
    from flax import linen as nn
    import jax

    # dense: (8, 32) @ (32, 16) -> 2*8*16*32 FLOPs
    def f(x, w):
        return x @ w

    x = jnp.ones((8, 32)); w = jnp.ones((32, 16))
    res = flop_count_analytic(f, x, w)
    assert res["dot_gflops"] * 1e9 == pytest.approx(2 * 8 * 16 * 32)
    assert res["conv_gflops"] == 0.0

    # conv: NHWC (1,16,16,4) * 3x3x4->8 same-pad -> 2*(1*16*16*8)*(3*3*4)
    conv = nn.Conv(features=8, kernel_size=(3, 3), padding="SAME")
    xi = jnp.ones((1, 16, 16, 4))
    vars_ = conv.init(jax.random.key(0), xi)
    res2 = flop_count_analytic(lambda a: conv.apply(vars_, a), xi)
    assert res2["conv_gflops"] * 1e9 == pytest.approx(2 * 16 * 16 * 8 * 3 * 3 * 4)
    assert parameter_count(vars_["params"]) == 3 * 3 * 4 * 8 + 8


def test_colormode_and_genericmask():
    """ColorMode.IMAGE_BW grayscales outside instance masks;
    ColorMode.SEGMENTATION colors by metadata.thing_colors; GenericMask
    round-trips polygons <-> bitmask (reference visualizer.py:37,88)."""
    import numpy as np

    from jtsm_tpu.data.catalog import MetadataCatalog
    from jtsm_tpu.utils.visualizer import ColorMode, GenericMask, Visualizer

    gm = GenericMask([[0.0, 0.0, 6.0, 0.0, 6.0, 6.0, 0.0, 6.0]], 10, 10)
    assert gm.mask.shape == (10, 10) and gm.area() > 0
    assert (GenericMask(gm.mask, 10, 10).polygons[0].reshape(-1, 2) >= 0).all()
    assert gm.bbox()[2] >= 6

    img = np.full((16, 16, 3), 200, np.uint8)
    img[:, :, 0] = 10  # strong color cast so grayscale is detectable
    preds = {
        "boxes": np.asarray([[2, 2, 10, 10]], np.float32),
        "scores": np.asarray([0.9], np.float32),
        "classes": np.asarray([0], np.int64),
        "valid": np.asarray([True]),
        "masks": np.asarray([np.pad(np.ones((4, 4)), ((2, 10), (2, 10)))]),
    }
    out = Visualizer(img, instance_mode=ColorMode.IMAGE_BW).draw_instance_predictions(
        dict(preds)
    ).get_image()
    assert out[15, 15, 0] == out[15, 15, 1] == out[15, 15, 2]  # grayscale outside

    meta = MetadataCatalog.get("colormode_test_meta")
    meta.thing_classes = ["a"]
    meta.thing_colors = [[250, 5, 5]]
    out2 = Visualizer(img, meta, instance_mode=ColorMode.SEGMENTATION)
    c = out2._instance_color(0, 0)
    assert c[0] > c[2]  # red-dominant, from thing_colors not the global map


def test_color_transforms_and_misc_utils():
    """ColorTransform/PILColorTransform keep coordinates fixed; log_every_n /
    create_small_table / convert_image_to_rgb / check_metadata_consistency
    behave per reference."""
    import numpy as np
    import pytest

    from jtsm_tpu.data import MetadataCatalog
    from jtsm_tpu.data import transforms as T
    from jtsm_tpu.data.detection_utils import (
        check_metadata_consistency,
        convert_image_to_rgb,
    )
    from jtsm_tpu.utils.logger import create_small_table

    t = T.ColorTransform(lambda im: im * 2)
    img = np.ones((4, 4, 3), np.uint8)
    assert (t.apply_image(img) == 2).all()
    assert (t.apply_coords(np.ones((2, 2))) == 1).all()
    assert (t.apply_segmentation(img) == 1).all()
    assert isinstance(t.inverse(), T.NoOpTransform)
    p = T.PILColorTransform(lambda im: im.point(lambda v: v + 3))
    assert (p.apply_image(img) == 4).all()

    bgr = np.zeros((2, 2, 3), np.uint8)
    bgr[..., 0] = 255
    assert convert_image_to_rgb(bgr, "BGR")[0, 0, 2] == 255

    MetadataCatalog.get("cmc_t_a").thing_classes = ["x"]
    MetadataCatalog.get("cmc_t_b").thing_classes = ["y"]
    with pytest.raises(ValueError):
        check_metadata_consistency("thing_classes", ["cmc_t_a", "cmc_t_b"])
    check_metadata_consistency("thing_classes", ["cmc_t_a", "cmc_t_a"])

    table = create_small_table({"AP": 1.0, "AP50": 2.0})
    assert "AP50" in table and table.count("\n") == 2
