#!/usr/bin/env python
"""Throughput benchmarks for data loading / training / inference
(reference: tools/benchmark.py)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from jtsm_tpu.config import get_cfg
from jtsm_tpu.engine import default_argument_parser, default_setup
from jtsm_tpu.modeling import build_model


def benchmark_data(cfg, num_batches=50):
    from jtsm_tpu.data import build_detection_train_loader

    loader = build_detection_train_loader(cfg)
    it = iter(loader)
    next(it)
    start = time.perf_counter()
    n = 0
    for _ in range(num_batches):
        b = next(it)
        n += b["image"].shape[0]
    dt = time.perf_counter() - start
    print(f"data: {n / dt:.1f} imgs/s")


def benchmark_train(cfg, num_iters=20):
    from jtsm_tpu.data import build_detection_train_loader
    from jtsm_tpu.engine.train_loop import TrainState, make_train_step
    from jtsm_tpu.solver import build_optimizer

    model = build_model(cfg)
    loader = build_detection_train_loader(cfg)
    it = iter(loader)
    batch = {k: v for k, v in next(it).items() if k != "image_ids"}
    rng = jax.random.key(0)
    variables = jax.jit(
        lambda r: model.init({"params": r, "sampling": r}, batch, train=True)
    )(rng)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=rng,
    )
    step = jax.jit(make_train_step(model, tx))
    state, m = step(state, batch)
    jax.block_until_ready(m)
    start = time.perf_counter()
    n = 0
    for _ in range(num_iters):
        batch = {k: v for k, v in next(it).items() if k != "image_ids"}
        state, m = step(state, batch)
        n += batch["image"].shape[0]
    jax.block_until_ready(m)
    dt = time.perf_counter() - start
    print(f"train: {n / dt:.2f} imgs/s ({dt / num_iters:.3f} s/it)")


def benchmark_eval(cfg, num_iters=20):
    model = build_model(cfg)
    b = cfg.SOLVER.IMS_PER_BATCH
    bh, bw = cfg.TPU.IMAGE_BUCKETS[0]
    batch0 = {
        "image": jnp.zeros((b, bh, bw, 3), jnp.float32),
        "image_sizes": jnp.tile(jnp.asarray([[bh, bw]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[bh, bw]], jnp.int32), (b, 1)),
    }
    rng = jax.random.key(0)
    variables = jax.jit(
        lambda r: model.init({"params": r, "sampling": r}, batch0, train=False)
    )(rng)

    def step(v, seed):
        img = jax.random.uniform(jax.random.key(seed), (b, bh, bw, 3)) * 255
        out = model.apply(v, dict(batch0, image=img), train=False)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(out))

    f = jax.jit(step)
    float(f(variables, 0))
    start = time.perf_counter()
    for i in range(1, num_iters + 1):
        val = float(f(variables, i))
    dt = time.perf_counter() - start
    print(f"eval: {b * num_iters / dt:.2f} imgs/s")


if __name__ == "__main__":
    parser = default_argument_parser()
    parser.add_argument("--task", default="eval", choices=["data", "train", "eval"])
    args = parser.parse_args()
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    {"data": benchmark_data, "train": benchmark_train, "eval": benchmark_eval}[args.task](cfg)
