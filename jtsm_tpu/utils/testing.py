"""Test utilities (reference: detectron2/utils/testing.py
``get_model_no_weights`` — build a zoo model without downloading weights)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_model_no_weights(config_path: str, tiny: bool = False):
    """Build (model, variables) from a zoo config with random init."""
    from .. import model_zoo
    from ..modeling import build_model

    cfg = model_zoo.get_config(config_path, trained=False)
    cfg.MODEL.WEIGHTS = ""
    if tiny:
        cfg.MODEL.RESNETS.DEPTH = 18
        cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
        cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    bh, bw = (128, 128) if tiny else tuple(cfg.TPU.IMAGE_BUCKETS[0])
    batch = {
        "image": jnp.zeros((1, bh, bw, 3), jnp.float32),
        "image_sizes": jnp.asarray([[bh, bw]], jnp.int32),
        "orig_sizes": jnp.asarray([[bh, bw]], jnp.int32),
    }
    rng = jax.random.key(0)
    variables = jax.jit(
        lambda r: model.init({"params": r, "sampling": r}, batch, train=False)
    )(rng)
    return model, variables


def random_boxes(num_boxes: int, max_coord: int = 100, seed: int = 0):
    import numpy as np

    rng = np.random.RandomState(seed)
    xy = rng.rand(num_boxes, 2) * max_coord * 0.5
    wh = rng.rand(num_boxes, 2) * max_coord * 0.5
    return jnp.asarray(
        __import__("numpy").concatenate([xy, xy + wh], axis=1).astype("float32")
    )


def assert_instances_allclose(input, other, *, rtol: float = 1e-5, msg: str = ""):
    """Assert two Instances hold the same fields with close values
    (reference utils/testing.py:65; arrays here are jax/numpy, Boxes are
    plain (N, 4) arrays inside the pytree)."""
    import numpy as np

    msg = (msg.rstrip() + " ") if msg else "Two Instances are different! "
    assert tuple(input.image_size) == tuple(other.image_size), (
        msg + f"image_size is {input.image_size} vs. {other.image_size}!"
    )
    fields = sorted(input.get_fields().keys())
    fields_other = sorted(other.get_fields().keys())
    assert fields == fields_other, msg + f"Fields are {fields} vs {fields_other}!"
    for f in fields:
        val1 = np.asarray(input.get(f))
        val2 = np.asarray(other.get(f))
        assert val1.shape == val2.shape, (
            msg + f"Field {f} shapes differ: {val1.shape} vs {val2.shape}"
        )
        if np.issubdtype(val1.dtype, np.floating):
            mag = float(np.abs(val1).max()) if val1.size else 1.0
            np.testing.assert_allclose(
                val1, val2, atol=max(mag, 1.0) * rtol,
                err_msg=msg + f"Field {f} differs too much!",
            )
        else:
            assert (val1 == val2).all(), msg + f"Field {f} is different!"
