"""TPU.REMAT: jax.checkpoint scopes must be numerically transparent — same
outputs, same gradients — while changing only what is stored between
forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np

from jtsm_tpu.config import get_cfg
from jtsm_tpu.layers import ShapeSpec
from jtsm_tpu.modeling.backbone.resnet import build_resnet_backbone


def _build(remat: bool):
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.BACKBONE.FREEZE_AT = 1  # res2..5 all trainable -> all rematted
    cfg.MODEL.RESNETS.NORM = "FrozenBN"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.REMAT = ["backbone_blocks"] if remat else []
    return build_resnet_backbone(cfg, ShapeSpec(channels=3))


def test_remat_backbone_same_outputs_and_grads():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    plain = _build(False)
    remat = _build(True)
    variables = plain.init(jax.random.key(0), x)

    def loss(model):
        def f(v):
            out = model.apply(v, x)
            return sum(jnp.sum(o**2) for o in out.values())

        return jax.jit(jax.value_and_grad(f))(variables)

    (l0, g0), (l1, g1) = loss(plain), loss(remat)
    # remat params live at the same tree paths (lifted transform preserves
    # the scope), so the same variables apply to both models
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1) and len(flat0) > 0
    for a, b in zip(flat0, flat1):
        a, b = np.asarray(a), np.asarray(b)
        # remat changes XLA's fusion boundaries, so grads differ by float
        # reassociation only (measured rel <= 3e-7 on this fixture)
        scale = np.max(np.abs(a)) + 1e-9
        np.testing.assert_array_less(np.max(np.abs(a - b)) / scale, 1e-5)


def test_remat_scopes_full_model_same_grads():
    """Whole-backbone + rpn_head + box_head + mask_head remat on a tiny Mask
    R-CNN: train losses and gradients match the unrematted model."""
    from jtsm_tpu.modeling import build_model
    from tests.modeling.test_meta_archs import _batch, _fpn_tiny

    from jtsm_tpu.config import get_cfg as _get_cfg

    def build(scopes):
        cfg = _fpn_tiny(_get_cfg())
        cfg.MODEL.MASK_ON = True
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.TPU.REMAT = scopes
        return build_model(cfg)

    batch = _batch(masks=True)
    plain = build([])
    remat = build(["backbone", "rpn_head", "box_head", "mask_head"])
    rngs = {"params": jax.random.key(0), "sampling": jax.random.key(1)}
    variables = plain.init(rngs, batch, train=True)

    def grads(model):
        def f(p):
            losses = model.apply(
                {**variables, "params": p},
                batch,
                train=True,
                rngs={"sampling": jax.random.key(2)},
            )
            return sum(jnp.sum(v) for v in losses.values()), losses

        return jax.jit(jax.value_and_grad(f, has_aux=True))(variables["params"])

    (l0, aux0), g0 = grads(plain)
    (l1, aux1), g1 = grads(remat)
    assert set(aux0) == set(aux1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.max(np.abs(a)) + 1e-9
        np.testing.assert_array_less(np.max(np.abs(a - b)) / scale, 1e-4)


def test_remat_backbone_jtsm_mcnn():
    """The WSL/JTSM meta-arch honors the "backbone" remat scope: one train
    step with finite losses, same keys as the unrematted step."""
    from jtsm_tpu.modeling import build_model
    from tests.test_wsl import _run_wsl, _wsl_batch, _wsl_cfg

    cfg = _wsl_cfg("JTSMROIHeads")
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedMCNNWSL"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.WSL.SP_ON = True
    cfg.WSL.PS_ON = True
    cfg.TPU.REMAT = ["backbone"]
    losses, out = _run_wsl(cfg, _wsl_batch(with_sp=True))
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    assert "loss_mil" in losses and "loss_sem_seg" in losses
