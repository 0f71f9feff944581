"""Shared CLI driver for the research projects' ``train_net.py`` scripts.

The reference ships a near-identical ``train_net.py`` per project
(e.g. projects/TridentNet/train_net.py, projects/PointRend/train_net.py):
parse args, ``add_<project>_config(cfg)``, merge file/CLI opts, then either
eval-only or train with ``DefaultTrainer``. This helper factors that body so
each project script is just ``project_cli(add_cfg)``.
"""

from __future__ import annotations

from typing import Callable, Optional

from ..config import CfgNode, get_cfg
from .defaults import default_argument_parser, default_setup
from .launch import launch


def _project_main(args, add_config: Optional[Callable], trainer_cls):
    cfg = get_cfg()
    if add_config is not None:
        add_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)

    from .defaults import DefaultTrainer

    trainer_cls = trainer_cls or DefaultTrainer

    if args.eval_only:
        import jax
        import jax.numpy as jnp

        from ..checkpoint import DetectionCheckpointer
        from ..evaluation import verify_results
        from ..modeling import build_model

        model = build_model(cfg)
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
        res = trainer_cls.test(cfg, model, variables=checkpointer.variables)
        if cfg.TEST.EXPECTED_RESULTS:
            verify_results(cfg, res)
        return res

    trainer = trainer_cls(cfg)
    trainer.resume_or_load(resume=args.resume)
    return trainer.train()


def project_cli(
    add_config: Optional[Callable[[CfgNode], None]] = None,
    trainer_cls=None,
) -> None:
    """Entry point used by each project's train_net.py."""
    args = default_argument_parser().parse_args()
    launch(
        _project_main,
        args.num_gpus,
        num_machines=args.num_machines,
        machine_rank=args.machine_rank,
        dist_url=args.dist_url,
        args=(args, add_config, trainer_cls),
    )
