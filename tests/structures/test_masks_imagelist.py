import jax.numpy as jnp
import numpy as np

from jtsm_tpu.structures import (
    BitMasks,
    ImageList,
    PolygonMasks,
    polygons_to_bitmask,
)


def test_imagelist_from_tensors():
    imgs = [jnp.zeros((30, 40, 3)), jnp.ones((20, 50, 3))]
    il = ImageList.from_tensors(imgs, size_divisibility=32)
    assert il.tensor.shape == (2, 32, 64, 3)
    np.testing.assert_array_equal(np.asarray(il.image_sizes), [[30, 40], [20, 50]])
    assert il[1].shape == (20, 50, 3)


def test_imagelist_pad_to_bucket():
    imgs = [jnp.zeros((30, 40, 3))]
    il = ImageList.from_tensors(imgs, pad_to=(64, 64))
    assert il.tensor.shape == (1, 64, 64, 3)


def test_polygons_to_bitmask_square():
    # a 10x10 axis-aligned square at (5,5)
    poly = [np.array([5.0, 5.0, 15.0, 5.0, 15.0, 15.0, 5.0, 15.0])]
    mask = polygons_to_bitmask(poly, 25, 25)
    assert mask.dtype == bool
    # interior is filled
    assert mask[10, 10]
    assert not mask[0, 0]
    area = mask.sum()
    assert 100 <= area <= 125  # boundary rounding tolerance


def test_bitmasks_crop_and_resize():
    m = np.zeros((1, 32, 32), dtype=bool)
    m[0, 8:24, 8:24] = True
    bm = BitMasks(m)
    out = bm.crop_and_resize(jnp.asarray([[8.0, 8.0, 24.0, 24.0]]), 14)
    out = np.asarray(out)
    assert out.shape == (1, 14, 14)
    # cropping the exact box -> nearly all ones
    assert out.mean() > 0.85


def test_polygonmasks_basic():
    poly = [[np.array([0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0])]]
    pm = PolygonMasks(poly)
    assert len(pm) == 1
    assert pm.nonempty().tolist() == [True]
    np.testing.assert_allclose(pm.area(), [100.0])
    bb = pm.get_bounding_boxes()
    np.testing.assert_allclose(np.asarray(bb.tensor), [[0, 0, 10, 10]])
    crop = pm.crop_and_resize(np.array([[0, 0, 10, 10]]), 8)
    assert np.asarray(crop).mean() > 0.8


def test_crop_and_resize_masks_separable_equals_gather():
    """crop_and_resize_masks (separable-matmul form) == the 4-corner
    zero-padded bilinear gather (structures/masks.py _bilinear_sample_2d),
    including boxes that poke outside the mask."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jtsm_tpu.structures.masks import (
        _bilinear_sample_2d,
        crop_and_resize_masks,
    )

    rng = np.random.RandomState(1)
    masks = jnp.asarray(rng.rand(5, 33, 41) > 0.5)
    bx = []
    for _ in range(5):
        x0, y0 = rng.uniform(-6, 25, 2)
        bx.append([x0, y0, x0 + rng.uniform(3, 45), y0 + rng.uniform(3, 45)])
    boxes = jnp.asarray(bx, jnp.float32)

    def gather_ref(masks, boxes, s):
        def one(mask, box):
            x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
            ys = y0 + (jnp.arange(s, dtype=jnp.float32) + 0.5) * ((y1 - y0) / s) - 0.5
            xs = x0 + (jnp.arange(s, dtype=jnp.float32) + 0.5) * ((x1 - x0) / s) - 0.5
            return _bilinear_sample_2d(mask.astype(jnp.float32), ys, xs)

        return jax.vmap(one)(masks, boxes)

    a = gather_ref(masks, boxes, 14)
    b = crop_and_resize_masks(masks, boxes, 14)
    assert float(jnp.abs(a - b).max()) < 1e-5
