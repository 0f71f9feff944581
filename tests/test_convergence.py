"""Learning-dynamics gate: a tiny model must fit a tiny fixed batch —
losses drop substantially over a short run (analog of the reference's
training_acc_test tier, scaled to CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jtsm_tpu.config import get_cfg
from jtsm_tpu.engine.train_loop import TrainState, make_train_step
from jtsm_tpu.modeling import build_model
from jtsm_tpu.solver import build_optimizer


@pytest.mark.slow
def test_tiny_overfit():
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.RESNETS.NORM = "GN"
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16], [32], [64], [128], [256]]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 2
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 64
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.MASK_ON = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.SOLVER.BASE_LR = 0.002
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.SOLVER.MAX_ITER = 60
    cfg.SOLVER.STEPS = (10000,)
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    b, g = 2, 2
    boxes = np.asarray(
        [[[8, 8, 28, 28], [34, 30, 56, 58]], [[10, 36, 30, 58], [36, 6, 60, 26]]],
        np.float32,
    )
    batch = {
        "image": jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32) * 255),
        "image_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray([[0, 1], [1, 0]], jnp.int32),
        "gt_valid": jnp.ones((b, g), bool),
    }
    key = jax.random.key(0)
    variables = model.init({"params": key, "sampling": key}, batch, train=True)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=key,
    )
    step = jax.jit(make_train_step(model, tx))

    first = None
    for i in range(60):
        state, metrics = step(state, batch)
        total = float(metrics["total_loss"])
        assert np.isfinite(total), (i, metrics)
        if first is None:
            first = total
    last = total
    assert last < first * 0.6, (first, last)
