"""Robustness contracts (reference tests/modeling/test_model_e2e.py:105
empty-instance edge cases, :161 AMP dtype contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jtsm_tpu.config import get_cfg
from jtsm_tpu.modeling import build_model


def _cfg(dtype="float32"):
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16], [32], [64], [128], [256]]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.TPU.COMPUTE_DTYPE = dtype
    return cfg


def _batch(valid_gt=True):
    rng = np.random.RandomState(0)
    b, g = 2, 3
    return {
        "image": jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32) * 255),
        "image_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "gt_boxes": jnp.asarray(
            np.concatenate([rng.rand(b, g, 2) * 20, 25 + rng.rand(b, g, 2) * 20], -1).astype(
                np.float32
            )
        ),
        "gt_classes": jnp.asarray(rng.randint(0, 3, (b, g)), jnp.int32),
        "gt_valid": jnp.full((b, g), valid_gt),
        "gt_mask_crops": jnp.asarray(rng.rand(b, g, 28, 28) > 0.5),
    }


def test_empty_gt_finite_losses():
    """With ZERO valid gt instances every loss must stay finite
    (reference test_model_e2e.py:105)."""
    cfg = _cfg()
    model = build_model(cfg)
    batch = _batch(valid_gt=False)
    vs = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)}, batch, train=True
    )
    losses = model.apply(vs, batch, train=True, rngs={"sampling": jax.random.key(2)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    # gradients too
    def total(params):
        l = model.apply(
            {"params": params, **{k: vs[k] for k in vs if k != "params"}},
            batch,
            train=True,
            rngs={"sampling": jax.random.key(2)},
        )
        return sum(jnp.asarray(v) for v in l.values())

    g = jax.grad(total)(vs["params"])
    gmax = max(float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gmax)


def test_bf16_compute_contract():
    """bf16 compute path: outputs are f32 and finite (reference
    test_model_e2e.py:161 AMP dtype contract)."""
    cfg = _cfg(dtype="bfloat16")
    model = build_model(cfg)
    batch = _batch()
    vs = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)}, batch, train=True
    )
    # params stored f32
    for leaf in jax.tree_util.tree_leaves(vs["params"]):
        assert leaf.dtype == jnp.float32
    losses = model.apply(vs, batch, train=True, rngs={"sampling": jax.random.key(2)})
    for k, v in losses.items():
        assert v.dtype == jnp.float32
        assert np.isfinite(float(v)), k
    out = model.apply(vs, batch, train=False)
    assert out["scores"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["scores"])).all()
