"""Seeded determinism: identical seeds -> bit-identical losses across fresh
processes of the train step (SURVEY.md hard-part 5: the JTSM PGT-mining
cascade needs seeded determinism to be debuggable)."""

import jax
import jax.numpy as jnp
import numpy as np

from jtsm_tpu.config import get_cfg
from jtsm_tpu.engine.train_loop import TrainState, make_train_step
from jtsm_tpu.modeling import build_model
from jtsm_tpu.solver import build_optimizer


def _run_once(seed: int):
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.RPN.IN_FEATURES = ["res4"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32]]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    b, g = 2, 3
    batch = {
        "image": jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32) * 255),
        "image_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "gt_boxes": jnp.asarray(
            np.concatenate([rng.rand(b, g, 2) * 20, 25 + rng.rand(b, g, 2) * 20], -1).astype(
                np.float32
            )
        ),
        "gt_classes": jnp.asarray(rng.randint(0, 3, (b, g)), jnp.int32),
        "gt_valid": jnp.ones((b, g), bool),
    }
    key = jax.random.key(seed)
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
    metrics = []
    for _ in range(3):
        state, m = step(state, batch)
        metrics.append({k: float(v) for k, v in m.items()})
    return metrics


def test_train_step_deterministic():
    a = _run_once(7)
    b = _run_once(7)
    assert a == b
    c = _run_once(8)
    # a different seed changes the sampled rois -> different losses
    assert any(a[i] != c[i] for i in range(len(a)))
