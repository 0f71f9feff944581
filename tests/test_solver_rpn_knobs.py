"""Knob wiring: SOLVER.CLIP_GRADIENTS.NORM_TYPE (per-parameter p-norm clip,
reference solver/build.py:27-58 applies clip_grad_norm_ per tensor) and
MODEL.RPN.BOUNDARY_THRESH (anchors outside the image beyond the threshold
are ignored, reference rpn.py label_and_sample_anchors)."""

import jax
import jax.numpy as jnp
import numpy as np

from jtsm_tpu.config import get_cfg
from jtsm_tpu.solver.build import clip_per_param_norm


def _clip_one(tx, grads):
    state = tx.init(grads)
    out, _ = tx.update(grads, state)
    return out


def test_clip_per_param_norm_l2_is_per_leaf():
    tx = clip_per_param_norm(1.0, 2.0)
    grads = {
        "big": jnp.asarray([3.0, 4.0]),  # l2 norm 5 -> scaled to ~1
        "small": jnp.asarray([0.3, 0.4]),  # l2 norm 0.5 -> untouched
    }
    out = _clip_one(tx, grads)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["big"])), 1.0, rtol=1e-4
    )
    # per-parameter: the small leaf must NOT be rescaled (a global-norm clip
    # would shrink it too, since the global norm sqrt(25 + 0.25) > 1)
    np.testing.assert_allclose(np.asarray(out["small"]), [0.3, 0.4], rtol=1e-5)


def test_clip_per_param_norm_inf():
    tx = clip_per_param_norm(0.5, float("inf"))
    grads = {"g": jnp.asarray([-2.0, 0.25])}
    out = _clip_one(tx, grads)
    # inf-norm 2.0 -> scale 0.25: both elements scale (norm clip, not clamp)
    np.testing.assert_allclose(np.asarray(out["g"]), [-0.5, 0.0625], rtol=1e-4)


def test_clip_matches_torch_clip_grad_norm():
    import torch

    g = np.random.RandomState(0).randn(4, 3).astype(np.float32) * 7
    for p in (1.0, 2.0, float("inf")):
        t = torch.tensor(g.copy(), requires_grad=True)
        t.grad = torch.tensor(g.copy())
        torch.nn.utils.clip_grad_norm_([t], 1.3, p)
        ours = _clip_one(clip_per_param_norm(1.3, p), {"w": jnp.asarray(g)})
        np.testing.assert_allclose(
            np.asarray(ours["w"]), t.grad.numpy(), rtol=1e-4, atol=1e-6
        )


def test_clip_full_model_is_global_norm():
    """CLIP_TYPE full_model (the reference's optional global_clipper path,
    solver/build.py:60): every leaf is scaled by the SAME factor
    clip/||g||_global, preserving the cross-tensor gradient direction —
    unlike per-parameter "norm" clipping, which rescales each tensor
    independently."""
    from jtsm_tpu.solver.build import build_optimizer

    cfg = get_cfg()
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "full_model"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    # two same-group (kernel) leaves so per-group lr/wd cannot differ
    params = {
        "params": {"a": {"kernel": jnp.zeros((2, 2))}, "b": {"kernel": jnp.zeros((3,))}}
    }
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    grads = {
        "params": {
            "a": {"kernel": jnp.full((2, 2), 3.0)},
            "b": {"kernel": jnp.full((3,), 0.01)},
        }
    }
    updates, _ = tx.update(grads, state, params)
    ka = float(np.asarray(updates["params"]["a"]["kernel"])[0, 0])
    kb = float(np.asarray(updates["params"]["b"]["kernel"])[0])
    # both leaves scaled by the SAME global factor: update ratio == grad
    # ratio (3.0 / 0.01). A per-parameter clip would normalize the large
    # leaf only, collapsing the ratio toward ~1/0.01 x (1/3).
    np.testing.assert_allclose(ka / kb, 3.0 / 0.01, rtol=1e-4)
    # and the large leaf was actually clipped: |update| << lr * |grad|
    lr0 = float(cfg.SOLVER.BASE_LR) * float(cfg.SOLVER.WARMUP_FACTOR)
    assert abs(ka) < lr0 * 3.0 * 0.6  # 1/gnorm ~ 1/6 scaling applied


def _tiny_rpn(boundary_thresh):
    from jtsm_tpu.layers.shape_spec import ShapeSpec
    from jtsm_tpu.modeling.proposal_generator.rpn import RPN

    cfg = get_cfg()
    cfg.MODEL.RPN.IN_FEATURES = ["res4"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.RPN.BOUNDARY_THRESH = boundary_thresh
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32]]
    shape = {"res4": ShapeSpec(channels=8, stride=16)}
    return RPN.from_config(cfg, shape)


def test_rpn_boundary_thresh_ignores_outside_anchors():
    kwargs = _tiny_rpn(0)
    rpn_ignore = __import__(
        "jtsm_tpu.modeling.proposal_generator.rpn", fromlist=["RPN"]
    ).RPN(**kwargs)
    kwargs_off = _tiny_rpn(-1)
    rpn_off = type(rpn_ignore)(**kwargs_off)

    assert rpn_ignore.boundary_threshold == 0.0
    assert rpn_off.boundary_threshold == -1.0

    feats = {"res4": jnp.zeros((1, 4, 4, 8))}
    # true image only 16x16 of the 64x64 padded grid: most anchors fall
    # outside -> with threshold 0 they are ignored instead of sampled
    sizes = jnp.asarray([[16, 16]], jnp.int32)
    gt_boxes = jnp.asarray([[[2.0, 2.0, 14.0, 14.0]]])
    gt_valid = jnp.asarray([[True]])

    rng = jax.random.PRNGKey(0)

    def losses(mod):
        vars_ = mod.init(
            {"params": rng, "sampling": rng},
            sizes,
            feats,
            gt_boxes,
            gt_valid,
            train=True,
        )
        _, _, loss = mod.apply(
            vars_, sizes, feats, gt_boxes, gt_valid, train=True, rngs={"sampling": rng}
        )
        return loss

    l_ignore = losses(rpn_ignore)
    l_off = losses(rpn_off)
    # ignoring the outside anchors removes most negatives from the sampled
    # set: the objectness loss must strictly drop (same rng stream)
    assert float(l_ignore["loss_rpn_cls"]) < float(l_off["loss_rpn_cls"])
    assert np.isfinite(float(l_ignore["loss_rpn_cls"]))
