#!/usr/bin/env python
"""Standard training CLI (reference: tools/train_net.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from jtsm_tpu.config import get_cfg
from jtsm_tpu.engine import (
    DefaultTrainer,
    default_argument_parser,
    default_setup,
    launch,
)
from jtsm_tpu.evaluation import verify_results


def setup(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    return cfg


def main(args):
    cfg = setup(args)

    if args.eval_only:
        from jtsm_tpu.checkpoint import DetectionCheckpointer
        import jax
        import jax.numpy as jnp

        from jtsm_tpu.modeling import build_model

        model = build_model(cfg)
        # init at largest bucket
        bh = max(b[0] for b in cfg.TPU.IMAGE_BUCKETS)
        bw = max(b[1] for b in cfg.TPU.IMAGE_BUCKETS)
        dummy = {
            "image": jnp.zeros((1, bh, bw, 3), jnp.float32),
            "image_sizes": jnp.asarray([[bh, bw]], jnp.int32),
            "orig_sizes": jnp.asarray([[bh, bw]], jnp.int32),
        }
        rng = jax.random.key(0)
        variables = jax.jit(
            lambda r: model.init({"params": r, "sampling": r}, dummy, train=False)
        )(rng)
        checkpointer = DetectionCheckpointer(dict(variables), cfg.OUTPUT_DIR)
        checkpointer.resume_or_load(cfg.MODEL.WEIGHTS, resume=args.resume)
        res = DefaultTrainer.test(cfg, model, variables=checkpointer.variables)
        if cfg.TEST.EXPECTED_RESULTS:
            verify_results(cfg, res)
        return res

    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    return trainer.train()


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    launch(
        main,
        args.num_gpus,
        num_machines=args.num_machines,
        machine_rank=args.machine_rank,
        dist_url=args.dist_url,
        args=(args,),
    )
