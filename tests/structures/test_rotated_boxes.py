import math

import jax.numpy as jnp
import numpy as np

from jtsm_tpu.structures import RotatedBoxes, pairwise_iou, pairwise_iou_rotated


def test_rotated_iou_axis_aligned_matches_standard():
    """0-degree rotated IoU must equal standard IoU."""
    rng = np.random.RandomState(1)
    n, m = 8, 6
    b1 = np.concatenate(
        [rng.rand(n, 2) * 50 + 25, rng.rand(n, 2) * 20 + 5, np.zeros((n, 1))], axis=1
    ).astype(np.float32)
    b2 = np.concatenate(
        [rng.rand(m, 2) * 50 + 25, rng.rand(m, 2) * 20 + 5, np.zeros((m, 1))], axis=1
    ).astype(np.float32)

    def to_xyxy(b):
        return np.stack(
            [b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2, b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2],
            axis=1,
        )

    expected = np.asarray(pairwise_iou(jnp.asarray(to_xyxy(b1)), jnp.asarray(to_xyxy(b2))))
    got = np.asarray(pairwise_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_rotated_iou_identical_box_any_angle():
    for ang in [0.0, 17.0, 45.0, 90.0, -30.0]:
        b = jnp.asarray([[10.0, 10.0, 8.0, 4.0, ang]])
        iou = float(pairwise_iou_rotated(b, b)[0, 0])
        assert abs(iou - 1.0) < 1e-4, (ang, iou)


def test_rotated_iou_90deg_swap():
    # box rotated 90 deg == box with w/h swapped
    b1 = jnp.asarray([[0.0, 0.0, 10.0, 4.0, 90.0]])
    b2 = jnp.asarray([[0.0, 0.0, 4.0, 10.0, 0.0]])
    iou = float(pairwise_iou_rotated(b1, b2)[0, 0])
    assert abs(iou - 1.0) < 1e-4


def test_rotated_iou_45deg_known_value():
    # two unit squares at same center, one rotated 45 degrees:
    # intersection is a regular octagon, area = 2*(sqrt(2)-1) ≈ 0.8284
    b1 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 45.0]])
    inter = 2 * (math.sqrt(2) - 1)
    expected = inter / (2 - inter)
    iou = float(pairwise_iou_rotated(b1, b2)[0, 0])
    assert abs(iou - expected) < 1e-3


def test_rotated_iou_disjoint():
    b1 = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 30.0]])
    b2 = jnp.asarray([[100.0, 100.0, 2.0, 2.0, -10.0]])
    assert float(pairwise_iou_rotated(b1, b2)[0, 0]) == 0.0


def test_rotated_boxes_class():
    rb = RotatedBoxes(jnp.asarray([[10.0, 10.0, 4.0, 2.0, 190.0]]))
    norm = rb.normalize_angles()
    assert -180 <= float(norm.tensor[0, 4]) < 180
    np.testing.assert_allclose(np.asarray(rb.area()), [8.0])
    assert len(rb[0]) == 1
