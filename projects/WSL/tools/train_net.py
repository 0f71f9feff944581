#!/usr/bin/env python
"""WSL training CLI (reference: projects/WSL/tools/train_net.py:56) —
gradient accumulation (WSL.ITER_SIZE), superpixel-aware loaders, WSOD TTA."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

import jax
import jax.numpy as jnp

import jtsm_tpu.wsl  # registers WSL components
from jtsm_tpu.config import get_cfg
from jtsm_tpu.engine import (
    DefaultTrainer,
    default_argument_parser,
    default_setup,
    launch,
)
from jtsm_tpu.wsl import add_wsl_config


class Trainer(DefaultTrainer):
    """WSL trainer: the reference accumulates gradients over WSL.ITER_SIZE
    mini-batches and skips empty-instance batches (train_net.py:74-119). On
    TPU the skip is unnecessary (static batches carry validity masks) and
    accumulation is optax.MultiSteps on the optimizer."""

    @classmethod
    def build_train_loader(cls, cfg):
        from jtsm_tpu.data import build_detection_train_loader

        return build_detection_train_loader(cfg)

    @classmethod
    def build_evaluator(cls, cfg, dataset_name, output_folder=None):
        from jtsm_tpu.data import MetadataCatalog
        from jtsm_tpu.evaluation import (
            COCOEvaluator,
            COCOPanopticEvaluator,
            DatasetEvaluators,
            PascalVOCDetectionEvaluator,
            SemSegEvaluator,
        )

        if output_folder is None:
            output_folder = os.path.join(cfg.OUTPUT_DIR, "inference")
        t = MetadataCatalog.get(dataset_name).get("evaluator_type", "coco")
        evals = []
        if t == "pascal_voc":
            evals.append(PascalVOCDetectionEvaluator(dataset_name))
        if t in ("coco", "coco_panoptic_seg"):
            evals.append(COCOEvaluator(dataset_name, output_dir=output_folder))
        if t == "coco_panoptic_seg":
            evals.append(COCOPanopticEvaluator(dataset_name, output_folder))
        return evals[0] if len(evals) == 1 else DatasetEvaluators(evals)


def setup(args):
    cfg = get_cfg()
    add_wsl_config(cfg)
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
        from jtsm_tpu.modeling import build_model

        model = build_model(cfg)
        bh = max(b[0] for b in cfg.TPU.IMAGE_BUCKETS)
        bw = max(b[1] for b in cfg.TPU.IMAGE_BUCKETS)
        r = cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST
        dummy = {
            "image": jnp.zeros((1, bh, bw, 3), jnp.float32),
            "image_sizes": jnp.asarray([[bh, bw]], jnp.int32),
            "orig_sizes": jnp.asarray([[bh, bw]], jnp.int32),
            "proposals": jnp.zeros((1, r, 4)),
            "proposal_scores": jnp.zeros((1, r)),
        }
        rng = jax.random.key(0)
        variables = jax.jit(
            lambda k: model.init({"params": k, "sampling": k, "dropout": k}, dummy, train=False)
        )(rng)
        ckpt = DetectionCheckpointer(dict(variables), cfg.OUTPUT_DIR)
        ckpt.resume_or_load(cfg.MODEL.WEIGHTS, resume=args.resume)
        return Trainer.test(cfg, model, variables=ckpt.variables)

    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    return trainer.train()


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    launch(main, args.num_gpus, args=(args,))
