import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jtsm_tpu.structures import (
    BoxMode,
    Boxes,
    box_area,
    clip_boxes,
    matched_pairwise_iou,
    nonempty_boxes,
    pairwise_ioa,
    pairwise_iou,
)


def _iou_ref(b1, b2):
    """Simple numpy reference."""
    n, m = len(b1), len(b2)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            xa = max(b1[i, 0], b2[j, 0])
            ya = max(b1[i, 1], b2[j, 1])
            xb = min(b1[i, 2], b2[j, 2])
            yb = min(b1[i, 3], b2[j, 3])
            inter = max(0, xb - xa) * max(0, yb - ya)
            a1 = (b1[i, 2] - b1[i, 0]) * (b1[i, 3] - b1[i, 1])
            a2 = (b2[j, 2] - b2[j, 0]) * (b2[j, 3] - b2[j, 1])
            out[i, j] = inter / (a1 + a2 - inter) if inter > 0 else 0.0
    return out


def test_pairwise_iou_matches_numpy():
    rng = np.random.RandomState(0)
    x0y0 = rng.rand(12, 2) * 100
    wh = rng.rand(12, 2) * 50 + 1
    b1 = np.concatenate([x0y0, x0y0 + wh], axis=1).astype(np.float32)
    x0y0 = rng.rand(7, 2) * 100
    wh = rng.rand(7, 2) * 50 + 1
    b2 = np.concatenate([x0y0, x0y0 + wh], axis=1).astype(np.float32)
    got = np.asarray(pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, _iou_ref(b1, b2), atol=1e-5)


def test_pairwise_iou_zero_degenerate():
    b1 = jnp.asarray([[10.0, 10.0, 10.0, 10.0]])  # zero-area
    b2 = jnp.asarray([[0.0, 0.0, 20.0, 20.0]])
    assert float(pairwise_iou(b1, b2)[0, 0]) == 0.0


def test_matched_pairwise_iou():
    b1 = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0]])
    b2 = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 10.0, 10.0]])
    iou = matched_pairwise_iou(b1, b2)
    np.testing.assert_allclose(np.asarray(iou), [1.0, 0.25], atol=1e-6)


def test_pairwise_ioa():
    b1 = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b2 = jnp.asarray([[0.0, 0.0, 5.0, 5.0]])
    assert float(pairwise_ioa(b1, b2)[0, 0]) == pytest.approx(1.0)


def test_clip_area_nonempty():
    b = jnp.asarray([[-5.0, -5.0, 5.0, 5.0], [0.0, 0.0, 0.0, 10.0]])
    clipped = clip_boxes(b, (20, 20))
    np.testing.assert_allclose(np.asarray(clipped[0]), [0, 0, 5, 5])
    assert np.asarray(box_area(clipped)).tolist() == [25.0, 0.0]
    assert np.asarray(nonempty_boxes(b)).tolist() == [True, False]


def test_boxmode_convert():
    box = [10.0, 20.0, 30.0, 40.0]  # XYWH
    xyxy = BoxMode.convert(box, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    assert xyxy == [10.0, 20.0, 40.0, 60.0]
    back = BoxMode.convert(xyxy, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    assert back == box

    arr = np.array([[10, 20, 30, 40]], dtype=np.float32)
    out = BoxMode.convert(arr, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(out, [[10, 20, 40, 60]])

    # rotated: 0-degree XYWHA == centered box
    rot = np.array([[20.0, 30.0, 10.0, 20.0, 0.0]])
    out = BoxMode.convert(rot, BoxMode.XYWHA_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(out, [[15, 20, 25, 40]], atol=1e-5)


def test_boxes_class_pytree():
    b = Boxes(jnp.asarray([[0.0, 0.0, 10.0, 10.0]]))

    @jax.jit
    def f(boxes):
        return Boxes(boxes.tensor * 2)

    out = f(b)
    assert isinstance(out, Boxes)
    np.testing.assert_allclose(np.asarray(out.tensor), [[0, 0, 20, 20]])
    assert len(out) == 1


def test_boxes_cat():
    b1 = Boxes(jnp.zeros((2, 4)))
    b2 = Boxes(jnp.ones((3, 4)))
    assert len(Boxes.cat([b1, b2])) == 5
