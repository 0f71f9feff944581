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
