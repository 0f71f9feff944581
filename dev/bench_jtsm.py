"""JTSM (weakly-supervised panoptic) training-step throughput on one chip.

Uses the flagship config (projects/WSL/configs/PascalVOC-PanopticSegmentation/
jtsm_WSR_18_DC5_1x.yaml) with synthetic VOC-shaped inputs: MCG-style
proposals + superpixel maps + image-level labels. No reference baseline
exists (the paper trained on 4 GPUs without publishing throughput);
vs_baseline reports img/s per device assuming the 4-GPU run matched
Mask R-CNN-class speed (~8 img/s/GPU) — treat it as indicative only.
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


def main():
    import jtsm_tpu.wsl  # registers WSL components

    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.engine import make_train_step
    from jtsm_tpu.engine.train_loop import TrainState
    from jtsm_tpu.modeling import build_model
    from jtsm_tpu.solver import build_optimizer
    from jtsm_tpu.wsl import add_wsl_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.merge_from_file(
        os.path.join(
            root,
            "projects/WSL/configs/PascalVOC-PanopticSegmentation/jtsm_WSR_18_DC5_1x.yaml",
        )
    )
    # the zoo flagship now mirrors the reference recipe (TwoClassHead stuff
    # branch, WSR-v2 backbone); this harness keeps measuring the LEARNED
    # stuff branch + v1 backbone so the full 12-loss step and its history
    # of numbers stay comparable
    cfg.MODEL.SEM_SEG_HEAD.NAME = "SemSegFPNHead"
    cfg.MODEL.BACKBONE.NAME = "build_wsl_resnet_backbone"
    cfg.WSL.ITER_SIZE = 1
    b = int(os.environ.get("BENCH_BATCH", str(cfg.SOLVER.IMS_PER_BATCH)))
    r = int(os.environ.get("BENCH_PROPOSALS", "2000"))
    n_sp = int(os.environ.get("BENCH_SUPERPIXELS", "1024"))
    h, w = 480, 864
    g = 6  # image-level classes per image (padded)

    model = build_model(cfg)
    rng_np = np.random.RandomState(0)
    xy = rng_np.rand(b, r, 2).astype(np.float32) * np.asarray([w - 80, h - 80], np.float32)
    wh = rng_np.rand(b, r, 2).astype(np.float32) * 76 + 4
    sp_side = int(np.sqrt(n_sp))
    sp = (
        (np.arange(h)[:, None] * sp_side // h) * sp_side
        + (np.arange(w)[None, :] * sp_side // w)
    ).astype(np.int32)
    batch = {
        "image": jnp.asarray(rng_np.rand(b, h, w, 3) * 255.0, jnp.float32),
        "image_sizes": jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1)),
        "proposals": jnp.asarray(np.concatenate([xy, xy + wh], -1)),
        "proposal_scores": jnp.asarray(rng_np.rand(b, r).astype(np.float32)),
        "gt_classes": jnp.asarray(rng_np.randint(0, 20, (b, g)), jnp.int32),
        "gt_valid": jnp.ones((b, g), bool),
        "gt_boxes": jnp.zeros((b, g, 4), jnp.float32),
        "superpixels": jnp.asarray(np.tile(sp[None], (b, 1, 1))),
        # MCG-style proposal-superpixel membership (one-hot over segments)
        "oh_labels": jnp.asarray(rng_np.rand(b, r, n_sp) > 0.6),
        "gt_sem_seg": jnp.asarray(
            rng_np.randint(0, 2, (b, h, w)), jnp.int32
        ),
    }

    rng = jax.random.key(0)
    t0 = time.time()
    variables = jax.jit(
        lambda k: model.init({"params": k, "sampling": k}, batch, train=True)
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
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    t0 = time.time()
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    print(
        f"compile+first: {time.time() - t0:.1f}s  "
        f"{ {k: round(float(v), 3) for k, v in metrics.items()} }",
        file=sys.stderr,
    )
    for v in metrics.values():
        assert np.isfinite(float(v)), metrics

    if os.environ.get("BENCH_PROFILE"):
        logdir = "/tmp/jtsm_profile_jtsm"
        os.makedirs(logdir, exist_ok=True)
        with jax.profiler.trace(logdir):
            for _ in range(2):
                state, metrics = step(state, batch)
            jax.block_until_ready(metrics)
        print(f"trace dumped to {logdir}", file=sys.stderr)

    iters = int(os.environ.get("BENCH_ITERS", "5"))
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    dt = time.time() - t0
    ips = b * iters / dt
    print(f"{ips:.2f} img/s  ({dt / iters * 1e3:.0f} ms/step of {b})", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "jtsm_wsr18_voc_train_imgs_per_sec_per_chip",
                "value": round(ips, 2),
                "unit": "imgs/sec",
                "vs_baseline": round(ips / 8.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
