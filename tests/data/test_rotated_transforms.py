"""Rotated-box data transforms (reference transform.py:307,323 and
detection_utils.py:271-273,431): XYWHA annotations must go through the
rotated-rect transform action, never the axis-aligning envelope."""

import numpy as np
import pytest

from jtsm_tpu.data import detection_utils as du
from jtsm_tpu.data import transforms as T
from jtsm_tpu.structures import BoxMode, RotatedBoxes


def test_hflip_rotated_box():
    tfm = T.HFlipTransform(width=200)
    rb = np.array([[50.0, 40.0, 30.0, 10.0, 25.0]])
    out = tfm.apply_rotated_box(rb)
    np.testing.assert_allclose(out, [[150.0, 40.0, 30.0, 10.0, -25.0]])


def test_resize_rotated_box_matches_structures_scale():
    # Anisotropic resize must refit the rotated rect exactly like
    # structures.RotatedBoxes.scale (the device-side twin of this host op).
    tfm = T.ResizeTransform(h=100, w=200, new_h=150, new_w=120)
    rb = np.array(
        [
            [50.0, 40.0, 30.0, 10.0, 25.0],
            [120.0, 80.0, 44.0, 60.0, -70.0],
            [10.0, 10.0, 5.0, 5.0, 0.0],
        ]
    )
    out = tfm.apply_rotated_box(rb)
    expected = np.asarray(RotatedBoxes(rb).scale(120 / 200.0, 150 / 100.0).tensor)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-4)


def test_transform_list_chains_and_noop():
    chain = T.TransformList(
        [T.NoOpTransform(), T.ResizeTransform(100, 200, 200, 400), T.HFlipTransform(400)]
    )
    rb = np.array([[50.0, 40.0, 30.0, 10.0, 25.0]])
    # isotropic 2x then flip: centers scale, sizes scale, angle negated
    out = chain.apply_rotated_box(rb)
    np.testing.assert_allclose(out, [[300.0, 80.0, 60.0, 20.0, -25.0]], atol=1e-5)


def test_unregistered_transform_raises():
    with pytest.raises(NotImplementedError):
        T.RotationTransform(100, 100, 30).apply_rotated_box(
            np.array([[10.0, 10.0, 4.0, 4.0, 0.0]])
        )


def test_transform_instance_annotations_rotated_mode_preserved():
    anno = {
        "bbox": [50.0, 40.0, 30.0, 10.0, 25.0],
        "bbox_mode": BoxMode.XYWHA_ABS,
        "category_id": 3,
    }
    out = du.transform_instance_annotations(
        dict(anno), T.TransformList([T.HFlipTransform(200)]), (100, 200)
    )
    assert out["bbox_mode"] == BoxMode.XYWHA_ABS
    np.testing.assert_allclose(out["bbox"], [150.0, 40.0, 30.0, 10.0, -25.0])


def test_annotations_to_instances_rotated():
    annos = [
        {"bbox": [50.0, 40.0, 30.0, 10.0, 45.0], "bbox_mode": BoxMode.XYWHA_ABS, "category_id": 1},
        # nearly axis-aligned box hanging off the edge: clipped
        {"bbox": [195.0, 50.0, 20.0, 10.0, 0.5], "bbox_mode": BoxMode.XYWHA_ABS, "category_id": 0},
    ]
    inst = du.annotations_to_instances_rotated(annos, (100, 200))
    assert inst.gt_boxes.shape == (2, 5)
    assert inst.gt_classes.tolist() == [1, 0]
    # box 0 is far from axis-aligned -> untouched
    np.testing.assert_allclose(inst.gt_boxes[0], [50.0, 40.0, 30.0, 10.0, 45.0])
    # box 1 (x-span 185..205) clips to 185..200 -> cx 192.5, w 15
    np.testing.assert_allclose(inst.gt_boxes[1], [192.5, 50.0, 15.0, 10.0, 0.5])

    empty = du.annotations_to_instances_rotated([], (100, 200))
    assert empty.gt_boxes.shape == (0, 5)

def test_filter_empty_instances_rotated():
    # rotated (N,5) XYWHA instances filter on w>thr & h>thr, like the
    # reference's RotatedBoxes.nonempty() — not on the XYXY arithmetic
    annos = [
        {"bbox": [50.0, 40.0, 30.0, 10.0, 45.0], "bbox_mode": BoxMode.XYWHA_ABS, "category_id": 1},
        {"bbox": [60.0, 45.0, 0.0, 10.0, 10.0], "bbox_mode": BoxMode.XYWHA_ABS, "category_id": 2},
        # cx < w would wrongly survive / die under the XYXY formula
        {"bbox": [5.0, 90.0, 8.0, 6.0, -30.0], "bbox_mode": BoxMode.XYWHA_ABS, "category_id": 0},
    ]
    inst = du.annotations_to_instances_rotated(annos, (100, 200))
    kept = du.filter_empty_instances(inst)
    assert kept.gt_classes.tolist() == [1, 0]
    np.testing.assert_allclose(kept.gt_boxes[1], [5.0, 90.0, 8.0, 6.0, -30.0])
