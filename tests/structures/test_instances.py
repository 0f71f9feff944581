import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jtsm_tpu.structures import Boxes, Instances


def test_fields_and_len():
    inst = Instances((100, 200))
    inst.boxes = jnp.zeros((5, 4))
    inst.scores = jnp.zeros((5,))
    assert len(inst) == 5
    assert inst.has("boxes") and not inst.has("masks")
    with pytest.raises(AssertionError):
        inst.bad = jnp.zeros((3,))


def test_getitem_slice_and_mask():
    inst = Instances((10, 10))
    inst.scores = jnp.arange(6.0)
    sub = inst[2:4]
    np.testing.assert_allclose(np.asarray(sub.scores), [2.0, 3.0])
    mask = jnp.asarray([True, False, True, False, False, True])
    sub2 = inst[mask]
    np.testing.assert_allclose(np.asarray(sub2.scores), [0.0, 2.0, 5.0])


def test_cat():
    i1 = Instances((10, 10), scores=jnp.arange(2.0))
    i2 = Instances((10, 10), scores=jnp.arange(3.0))
    out = Instances.cat([i1, i2])
    assert len(out) == 5


def test_pytree_through_jit():
    inst = Instances((32, 32))
    inst.boxes = jnp.ones((4, 4))
    inst.valid = jnp.asarray([True, True, False, False])

    @jax.jit
    def f(x: Instances):
        out = Instances(x.image_size)
        out.boxes = x.boxes * 2
        out.valid = x.valid
        return out

    y = f(inst)
    assert isinstance(y, Instances)
    assert y.image_size == (32, 32)
    np.testing.assert_allclose(np.asarray(y.boxes), 2 * np.ones((4, 4)))


def test_boxes_field():
    inst = Instances((10, 10))
    inst.pred_boxes = Boxes(jnp.zeros((3, 4)))
    assert len(inst) == 3
    sub = inst[jnp.asarray([0, 2])]
    assert len(sub.pred_boxes) == 2
