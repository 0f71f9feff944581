#!/usr/bin/env python
"""Bare-bones training script showing the manual loop (reference:
tools/plain_train_net.py) — everything DefaultTrainer does, spelled out."""

import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from jtsm_tpu.checkpoint import DetectionCheckpointer, PeriodicCheckpointer
from jtsm_tpu.config import get_cfg
from jtsm_tpu.data import build_detection_train_loader
from jtsm_tpu.engine import default_argument_parser, default_setup, launch
from jtsm_tpu.engine.train_loop import TrainState, make_train_step
from jtsm_tpu.modeling import build_model
from jtsm_tpu.solver import build_lr_schedule, build_optimizer
from jtsm_tpu.utils.events import (
    CommonMetricPrinter,
    EventStorage,
    JSONWriter,
)

logger = logging.getLogger("jtsm_tpu")


def do_train(cfg, resume=False):
    model = build_model(cfg)
    loader = build_detection_train_loader(cfg)
    it = iter(loader)
    example = next(it)
    example = {k: v for k, v in example.items() if k != "image_ids"}

    rng = jax.random.key(max(cfg.SEED, 0))
    init_rng, sample_rng, state_rng = jax.random.split(rng, 3)
    variables = jax.jit(
        lambda r, s: model.init({"params": r, "sampling": s}, example, train=True)
    )(init_rng, sample_rng)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=state_rng,
    )

    checkpointer = DetectionCheckpointer(dict(variables), cfg.OUTPUT_DIR)
    start_iter = 0
    if resume and checkpointer.has_checkpoint():
        extra = checkpointer.resume_or_load("", resume=True)
        start_iter = int(extra.get("iteration", -1)) + 1
        state = state.replace(params=checkpointer.variables["params"])
    periodic = PeriodicCheckpointer(checkpointer, cfg.SOLVER.CHECKPOINT_PERIOD, cfg.SOLVER.MAX_ITER)

    train_step = jax.jit(make_train_step(model, tx))
    schedule = build_lr_schedule(cfg)
    max_iter = cfg.SOLVER.MAX_ITER
    writers = [CommonMetricPrinter(max_iter), JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))]

    logger.info(f"Starting training from iteration {start_iter}")
    with EventStorage(start_iter) as storage:
        batch = example
        for iteration in range(start_iter, max_iter):
            storage.iter = iteration
            state, metrics = train_step(state, batch)
            batch = {k: v for k, v in next(it).items() if k != "image_ids"}
            for k, v in metrics.items():
                storage.put_scalar(k, float(v))
            storage.put_scalar("lr", float(schedule(iteration)), smoothing_hint=False)
            checkpointer.variables = {"params": state.params, "frozen": state.frozen}
            periodic.step(iteration)
            if (iteration + 1) % 20 == 0 or iteration == max_iter - 1:
                for writer in writers:
                    writer.write()
            storage.step()


def main(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    do_train(cfg, resume=args.resume)


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    launch(main, args.num_gpus, args=(args,))
