#!/usr/bin/env python
"""Export a trained model for deployment.

Reference: tools/deploy/caffe2_converter.py (Caffe2/ONNX/TorchScript).
TPU-native formats:

  stablehlo   portable XLA IR text (inspection / ahead-of-time compile)
  jax         jax.export serialized artifact — versioned bytes that
              re-load with jax.export.deserialize on any JAX install;
              consumed by the C++ host example (jtsm_infer.cpp)
  tf          TF SavedModel via jax2tf (TF-Serving stacks)

  python tools/deploy/export_model.py --config-file configs/...yaml \
      --format jax --output out/model.jax MODEL.WEIGHTS weights.ckpt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../.."))

import jax
import jax.numpy as jnp

from jtsm_tpu.config import get_cfg
from jtsm_tpu.checkpoint import DetectionCheckpointer
from jtsm_tpu.export.api import TPUTracer
from jtsm_tpu.modeling import build_model


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--format", default="jax", choices=["stablehlo", "jax", "tf"])
    ap.add_argument("--output", required=True,
                    help="output file (stablehlo/jax) or directory (tf)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--height", type=int, default=0,
                    help="input bucket height (default: largest TPU.IMAGE_BUCKETS)")
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()

    buckets = [tuple(b) for b in cfg.TPU.IMAGE_BUCKETS]
    bh = args.height or max(b[0] for b in buckets)
    bw = args.width or max(b[1] for b in buckets)

    model = build_model(cfg)
    batch = {
        "image": jnp.zeros((args.batch, bh, bw, 3), jnp.float32),
        "image_sizes": jnp.tile(jnp.asarray([[bh, bw]], jnp.int32), (args.batch, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[bh, bw]], jnp.int32), (args.batch, 1)),
    }
    rng = jax.random.key(0)
    variables = jax.jit(
        lambda r: model.init({"params": r, "sampling": r}, batch, train=False)
    )(rng)
    if cfg.MODEL.WEIGHTS:
        ckpt = DetectionCheckpointer(dict(variables))
        ckpt.load(cfg.MODEL.WEIGHTS)
        variables = ckpt.variables

    tracer = TPUTracer(cfg, model, variables, batch)
    if args.format == "stablehlo":
        tracer.export_stablehlo(args.output)
    elif args.format == "jax":
        tracer.export_jax_exported(args.output)
    else:
        tracer.export_tf_saved_model(args.output)
    print(f"exported ({args.format}, input {args.batch}x{bh}x{bw}x3) -> {args.output}")


if __name__ == "__main__":
    main()
