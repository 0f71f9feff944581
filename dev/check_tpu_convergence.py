"""Overfit a small Mask R-CNN on ONE fixed synthetic batch on the real
chip, with the Pallas resident pooler + backward active (FPN C=256).
Asserts the total loss drops — the end-to-end guard that the custom
forward/backward kernels actually train."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jtsm_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.engine import make_train_step
    from jtsm_tpu.engine.train_loop import TrainState
    from jtsm_tpu.modeling import build_model
    from jtsm_tpu.solver import build_optimizer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(root, "configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml")
    )
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 128
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.SOLVER.BASE_LR = 0.002
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    model = build_model(cfg)

    b, h, w, g = 2, 128, 128, 4
    rng_np = np.random.RandomState(0)
    mc = cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION * 4
    x0 = rng_np.uniform(0, w - 60, (b, g)).astype(np.float32)
    y0 = rng_np.uniform(0, h - 60, (b, g)).astype(np.float32)
    boxes = np.stack(
        [x0, y0, x0 + rng_np.uniform(20, 50, (b, g)), y0 + rng_np.uniform(20, 50, (b, g))],
        -1,
    ).astype(np.float32)
    batch = {
        "image": jnp.asarray(rng_np.rand(b, h, w, 3) * 255.0, jnp.float32),
        "image_sizes": jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1)),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rng_np.randint(0, 80, (b, g)), jnp.int32),
        "gt_valid": jnp.ones((b, g), bool),
        "gt_mask_crops": jnp.asarray(rng_np.rand(b, g, mc, mc) > 0.5),
    }

    rng = jax.random.key(0)
    variables = jax.jit(
        lambda r: model.init({"params": r, "sampling": r}, batch, train=True)
    )(rng)
    jax.block_until_ready(variables)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=jax.jit(tx.init)(variables["params"]),
        rng=rng,
    )
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    t0 = time.time()
    losses = []
    for i in range(60):
        state, metrics = step(state, batch)
        if i % 10 == 0 or i == 59:
            val = float(metrics["total_loss"])
            losses.append(val)
            print(f"iter {i:3d}  total_loss {val:.4f}", file=sys.stderr)
            assert np.isfinite(val), f"non-finite loss at iter {i}"
    print(f"60 iters in {time.time() - t0:.1f}s", file=sys.stderr)
    drop = (losses[0] - losses[-1]) / losses[0]
    print(f"loss {losses[0]:.3f} -> {losses[-1]:.3f}  ({drop:.1%} drop)")
    assert drop > 0.30, f"insufficient convergence: {drop:.1%}"
    print("TPU CONVERGENCE OK")


if __name__ == "__main__":
    main()
