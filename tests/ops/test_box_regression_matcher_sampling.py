import jax
import jax.numpy as jnp
import numpy as np

from jtsm_tpu.ops import (
    Box2BoxTransform,
    Matcher,
    paste_masks_in_image,
    smooth_l1_loss,
    subsample_labels,
)


def test_box2box_roundtrip():
    rng = np.random.RandomState(0)
    xy = rng.rand(20, 2) * 100
    wh = rng.rand(20, 2) * 40 + 2
    src = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    xy = rng.rand(20, 2) * 100
    wh = rng.rand(20, 2) * 40 + 2
    tgt = np.concatenate([xy, xy + wh], 1).astype(np.float32)

    t = Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0))
    deltas = t.get_deltas(jnp.asarray(src), jnp.asarray(tgt))
    rec = np.asarray(t.apply_deltas(deltas, jnp.asarray(src)))
    np.testing.assert_allclose(rec, tgt, atol=5e-3)


def test_apply_deltas_multiclass_shape():
    t = Box2BoxTransform(weights=(1.0, 1.0, 1.0, 1.0))
    boxes = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    deltas = jnp.zeros((1, 8))  # 2 classes
    out = t.apply_deltas(deltas, boxes)
    assert out.shape == (1, 8)
    np.testing.assert_allclose(np.asarray(out).reshape(2, 4), [[0, 0, 10, 10]] * 2, atol=1e-5)


def test_matcher_rpn_style():
    m = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
    # 2 gt x 4 anchors
    quality = jnp.asarray(
        [
            [0.9, 0.1, 0.4, 0.05],
            [0.2, 0.25, 0.6, 0.05],
        ]
    )
    matches, labels = m(quality)
    assert np.asarray(matches).tolist() == [0, 1, 1, 0]
    # a0: 0.9 -> fg; a1: 0.25 -> bg... but allow_low_quality: not best of any gt
    # (gt1's best is a2 with 0.6). a2: 0.6 -> ignore(-1)? 0.6 in [0.3, 0.7) -> -1,
    # but a2 is gt1's best -> promoted to 1. a3: 0.05 -> bg.
    assert np.asarray(labels).tolist() == [1, 0, 1, 0]


def test_matcher_gt_valid_mask():
    m = Matcher([0.5], [0, 1])
    quality = jnp.asarray([[0.9, 0.8], [0.0, 0.95]])
    _, labels_all = m(quality)
    assert np.asarray(labels_all).tolist() == [1, 1]
    _, labels_masked = m(quality, gt_valid=jnp.asarray([True, False]))
    assert np.asarray(labels_masked).tolist() == [1, 1]  # a1 still matches gt0 0.8
    _, labels_only1 = m(quality, gt_valid=jnp.asarray([False, True]))
    assert np.asarray(labels_only1).tolist() == [0, 1]


def test_subsample_labels_counts():
    rng = jax.random.key(0)
    labels = jnp.asarray([5] * 30 + [80] * 200 + [-1] * 26)  # 30 fg, 200 bg
    pos, neg = subsample_labels(rng, labels, 64, 0.25, bg_label=80)
    npos = int(pos.sum())
    nneg = int(neg.sum())
    assert npos == 16  # capped at 64*0.25
    assert nneg == 48
    assert not bool((pos & neg).any())
    # positives drawn from fg only
    assert bool((jnp.nonzero(pos)[0] < 30).all())


def test_subsample_labels_few_fg():
    rng = jax.random.key(1)
    labels = jnp.asarray([3] * 4 + [80] * 100)
    pos, neg = subsample_labels(rng, labels, 64, 0.25, bg_label=80)
    assert int(pos.sum()) == 4
    assert int(neg.sum()) == 60


def test_smooth_l1():
    x = jnp.asarray([0.0, 0.5, 2.0])
    y = jnp.zeros(3)
    out = np.asarray(smooth_l1_loss(x, y, beta=1.0))
    np.testing.assert_allclose(out, [0.0, 0.125, 1.5], atol=1e-6)
    out0 = np.asarray(smooth_l1_loss(x, y, beta=0.0))
    np.testing.assert_allclose(out0, [0.0, 0.5, 2.0], atol=1e-6)


def test_paste_masks_full_box():
    masks = jnp.ones((1, 14, 14))
    boxes = jnp.asarray([[4.0, 4.0, 12.0, 12.0]])
    out = np.asarray(paste_masks_in_image(masks, boxes, (16, 16), 0.5))
    assert out.shape == (1, 16, 16)
    assert out[0, 8, 8]
    assert not out[0, 0, 0]
    assert not out[0, 15, 15]
    # pasted area approximately box area
    assert 40 <= out[0].sum() <= 80
