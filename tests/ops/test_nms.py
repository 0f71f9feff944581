import jax.numpy as jnp
import numpy as np

from jtsm_tpu.ops import batched_nms_mask, nms, nms_mask


def nms_ref(boxes, scores, thresh):
    """Greedy NMS in numpy (reference semantics)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        iw = np.maximum(0.0, xx2 - xx1)
        ih = np.maximum(0.0, yy2 - yy1)
        inter = iw * ih
        union = areas[i] + areas[order[1:]] - inter
        iou = np.where(inter > 0, inter / union, 0.0)
        inds = np.where(iou <= thresh)[0]
        order = order[inds + 1]
    return sorted(keep)


def _random_boxes(rng, n, scale=100):
    xy = rng.rand(n, 2) * scale
    wh = rng.rand(n, 2) * (scale / 2) + 1
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_nms_matches_greedy_reference():
    rng = np.random.RandomState(42)
    for trial in range(3):
        boxes = _random_boxes(rng, 60)
        scores = rng.rand(60).astype(np.float32)
        for t in [0.3, 0.5, 0.7]:
            keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), t))
            got = sorted(np.nonzero(keep)[0].tolist())
            expected = nms_ref(boxes, scores, t)
            assert got == expected, (trial, t)


def test_nms_tiled_matches_greedy_multitile():
    """Exercise the tiled fixpoint path with several tiles and heavy overlap."""
    rng = np.random.RandomState(7)
    n = 300
    # clustered boxes -> long suppression chains
    centers = rng.rand(n, 2) * 60
    wh = rng.rand(n, 2) * 30 + 5
    boxes = np.concatenate([centers, centers + wh], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    from jtsm_tpu.ops.nms import nms_mask_sequential

    for t in [0.3, 0.5, 0.7]:
        keep_tiled = np.asarray(
            __import__("jtsm_tpu.ops.nms", fromlist=["nms_mask"]).nms_mask(
                jnp.asarray(boxes), jnp.asarray(scores), t, tile=64
            )
        )
        keep_seq = np.asarray(
            nms_mask_sequential(jnp.asarray(boxes), jnp.asarray(scores), t)
        )
        np.testing.assert_array_equal(keep_tiled, keep_seq)
        expected = nms_ref(boxes, scores, t)
        assert sorted(np.nonzero(keep_tiled)[0].tolist()) == expected


def test_nms_padding_ignored():
    boxes = np.array(
        [[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]], dtype=np.float32
    )
    scores = np.array([0.9, 0.8, -np.inf], dtype=np.float32)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert keep.tolist() == [True, False, False]


def test_nms_indices_output():
    boxes = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], dtype=np.float32)
    scores = np.array([0.5, 0.9], dtype=np.float32)
    idx = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=4))
    assert idx.tolist()[:2] == [1, 0]
    assert (idx[2:] == -1).all()


def test_batched_nms_classes_do_not_suppress():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=np.float32)
    scores = np.array([0.9, 0.8], dtype=np.float32)
    same = np.asarray(
        batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray([0, 0]), 0.5)
    )
    diff = np.asarray(
        batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray([0, 1]), 0.5)
    )
    assert same.tolist() == [True, False]
    assert diff.tolist() == [True, True]
