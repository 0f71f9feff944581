"""Training-step throughput for Mask R-CNN R50-FPN on one chip, using the
engine's real train step (jtsm_tpu.engine.make_train_step).

Reference headline: 62 img/s on 8xV100 => 7.75 img/s/GPU
(docs/notes/benchmarks.md:22-28 in the reference). Prints one JSON line.
"""

import json
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

BASELINE_IMGS_PER_SEC_PER_DEV = 62.0 / 8.0


def main():
    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.engine import make_train_step
    from jtsm_tpu.engine.train_loop import TrainState
    from jtsm_tpu.modeling import build_model
    from jtsm_tpu.solver import build_optimizer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(
            root, "configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml"
        )
    )
    if os.environ.get("BENCH_REMAT"):
        # comma-separated scope list, or "1" for the per-block default
        scopes = os.environ["BENCH_REMAT"]
        cfg.TPU.REMAT = (
            ["backbone_blocks"] if scopes == "1" else scopes.split(",")
        )
    model = build_model(cfg)

    b = int(os.environ.get("BENCH_BATCH", "16"))
    h, w = 800, 1344
    g = 16
    mc = cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION * 4
    rng_np = np.random.RandomState(0)
    x0 = rng_np.uniform(0, w - 120, (b, g)).astype(np.float32)
    y0 = rng_np.uniform(0, h - 120, (b, g)).astype(np.float32)
    boxes = np.stack(
        [x0, y0, x0 + rng_np.uniform(20, 100, (b, g)), y0 + rng_np.uniform(20, 100, (b, g))],
        -1,
    ).astype(np.float32)
    batch0 = {
        "image": jnp.zeros((b, h, w, 3), jnp.float32),
        "image_sizes": jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1)),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rng_np.randint(0, 80, (b, g)), jnp.int32),
        "gt_valid": jnp.ones((b, g), bool),
        "gt_mask_crops": jnp.asarray(rng_np.rand(b, g, mc, mc) > 0.5),
    }

    rng = jax.random.key(0)
    t0 = time.time()
    variables = jax.jit(
        lambda r: model.init({"params": r, "sampling": r}, batch0, train=True)
    )(rng)
    jax.block_until_ready(variables)
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr)

    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=jax.jit(tx.init)(variables["params"]),
        rng=rng,
    )
    train_step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    def make_batch(seed):
        img = jax.random.uniform(jax.random.key(seed), (b, h, w, 3)) * 255.0
        return dict(batch0, image=img)

    t0 = time.time()
    state, metrics = train_step(state, make_batch(0))
    jax.block_until_ready(metrics)
    print(
        f"compile+first: {time.time() - t0:.1f}s  "
        f"{ {k: round(float(v), 3) for k, v in metrics.items()} }",
        file=sys.stderr,
    )

    if os.environ.get("BENCH_PROFILE"):
        logdir = "/tmp/jtsm_profile_train"
        os.makedirs(logdir, exist_ok=True)
        with jax.profiler.trace(logdir):
            for i in range(1, 3):
                state, metrics = train_step(state, make_batch(i))
            jax.block_until_ready(metrics)
        print(f"trace dumped to {logdir}", file=sys.stderr)

    iters = int(os.environ.get("BENCH_ITERS", "6"))
    t0 = time.time()
    for i in range(1, 1 + iters):
        state, metrics = train_step(state, make_batch(i))
    jax.block_until_ready(metrics)
    dt = time.time() - t0
    ips = b * iters / dt
    print(f"{ips:.2f} img/s  ({dt / iters * 1e3:.0f} ms/step of {b})", file=sys.stderr)
    mem = jax.local_devices()[0].memory_stats() or {}
    if "peak_bytes_in_use" in mem:
        print(
            f"peak HBM: {mem['peak_bytes_in_use'] / 2**30:.2f} GiB"
            f" (remat={'on' if os.environ.get('BENCH_REMAT') else 'off'})",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "maskrcnn_r50fpn_coco_train_imgs_per_sec_per_chip",
                "value": round(ips, 2),
                "unit": "imgs/sec",
                "vs_baseline": round(ips / BASELINE_IMGS_PER_SEC_PER_DEV, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
