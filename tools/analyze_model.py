#!/usr/bin/env python
"""FLOPs / parameter / structure analysis (reference: tools/analyze_model.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from jtsm_tpu.config import get_cfg
from jtsm_tpu.engine import default_argument_parser
from jtsm_tpu.modeling import build_model
from jtsm_tpu.utils.analysis import (
    activation_count,
    flop_count,
    parameter_count,
    parameter_count_table,
)

if __name__ == "__main__":
    parser = default_argument_parser()
    parser.add_argument("--tasks", nargs="+", default=["parameter", "flop", "structure"])
    args = parser.parse_args()
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)

    model = build_model(cfg)
    bh, bw = cfg.TPU.IMAGE_BUCKETS[0]
    batch = {
        "image": jnp.zeros((1, bh, bw, 3), jnp.float32),
        "image_sizes": jnp.asarray([[bh, bw]], jnp.int32),
        "orig_sizes": jnp.asarray([[bh, bw]], jnp.int32),
    }
    rng = jax.random.key(0)
    variables = jax.jit(
        lambda r: model.init({"params": r, "sampling": r}, batch, train=False)
    )(rng)

    if "parameter" in args.tasks:
        print(parameter_count_table(variables["params"]))
        print(f"total parameters: {parameter_count(variables['params']):,}")
    if "flop" in args.tasks:
        g = flop_count(lambda v, b: model.apply(v, b, train=False), variables, batch)
        a = activation_count(lambda v, b: model.apply(v, b, train=False), variables, batch)
        print(f"inference GFLOPs (XLA cost analysis): {g:.1f}")
        print(f"bytes accessed (GB): {a:.2f}")
    if "structure" in args.tasks:
        print(model)
