"""Default trainer/predictor/CLI glue.

Reference: detectron2/engine/defaults.py:47 (``default_argument_parser``),
:112 (``default_setup``), :161 (``DefaultPredictor``), :271
(``DefaultTrainer``), :556 (``auto_scale_workers``).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from collections import OrderedDict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import DetectionCheckpointer, PeriodicCheckpointer
from ..config import CfgNode
from ..data import (
    MetadataCatalog,
    build_detection_test_loader,
    build_detection_train_loader,
)
from ..data import transforms as T
from ..data.detection_utils import pick_bucket
from ..evaluation import (
    COCOEvaluator,
    DatasetEvaluators,
    PascalVOCDetectionEvaluator,
    SemSegEvaluator,
    inference_on_dataset,
    print_csv_format,
    verify_results,
)
from ..modeling import build_model
from ..parallel import build_mesh
from ..solver import build_lr_schedule, build_optimizer
from ..utils import comm
from ..utils.env import collect_env_info, seed_all_rng
from ..utils.events import CommonMetricPrinter, JSONWriter, TensorboardXWriter
from ..utils.logger import setup_logger
from . import hooks
from .train_loop import TrainState
from .trainer import SimpleTrainer, TrainerBase

logger = logging.getLogger(__name__)


def default_argument_parser(epilog=None):
    """Reference defaults.py:47."""
    parser = argparse.ArgumentParser(epilog=epilog)
    parser.add_argument("--config-file", default="", metavar="FILE", help="path to config file")
    parser.add_argument("--resume", action="store_true", help="resume from OUTPUT_DIR")
    parser.add_argument("--eval-only", action="store_true", help="perform evaluation only")
    parser.add_argument("--num-gpus", type=int, default=1, help="(compat) ignored on TPU")
    parser.add_argument("--num-machines", type=int, default=1)
    parser.add_argument("--machine-rank", type=int, default=0)
    parser.add_argument("--dist-url", default="auto")
    parser.add_argument(
        "opts",
        help="Modify config options at the end of the command: KEY VALUE pairs",
        default=None,
        nargs=argparse.REMAINDER,
    )
    return parser


def default_setup(cfg: CfgNode, args) -> None:
    """Reference defaults.py:112: output dir, logging, seeds, cfg dump."""
    # Honor JAX_PLATFORMS even where a sitecustomize force-registers an
    # accelerator plugin and overwrites jax_platforms (observed: the axon
    # TPU terminal sets "axon,cpu", silently ignoring the env var — which
    # sent "CPU" gate runs to the TPU). Must happen before anything
    # initializes a backend (collect_env_info below calls jax.devices()).
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        import jax

        try:
            jax.config.update("jax_platforms", env_platforms)
        except RuntimeError as e:  # backends already initialized
            logger.warning(f"Could not apply JAX_PLATFORMS={env_platforms}: {e}")

    output_dir = cfg.OUTPUT_DIR
    if comm.is_main_process() and output_dir:
        os.makedirs(output_dir, exist_ok=True)

    rank = comm.get_rank()
    setup_logger(output_dir, distributed_rank=rank)

    logger.info(f"Rank of current process: {rank}. World size: {comm.get_world_size()}")
    logger.info("Environment info:\n" + collect_env_info())
    if hasattr(args, "config_file") and args.config_file:
        logger.info(f"Contents of args.config_file={args.config_file}")
    logger.info(f"Running with full config:\n{cfg}")
    if comm.is_main_process() and output_dir:
        path = os.path.join(output_dir, "config.yaml")
        with open(path, "w") as f:
            f.write(cfg.dump())
        logger.info(f"Full config saved to {path}")

    seed = cfg.SEED
    seed_all_rng(None if seed < 0 else seed + rank)

    cache_dir = os.environ.get(
        "JTSM_XLA_CACHE_DIR", cfg.TPU.get("COMPILATION_CACHE_DIR", "")
    )
    if cache_dir:
        # persistent XLA compilation cache: a second invocation on the same
        # config skips the 20-40s TPU compile (programs keyed by HLO)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        logger.info(f"Persistent XLA compilation cache: {cache_dir}")


class DefaultPredictor:
    """Reference defaults.py:161. Takes ONE BGR image (numpy HWC uint8) and
    returns the detection dict for it."""

    def __init__(self, cfg: CfgNode):
        self.cfg = cfg.clone()
        self.model = build_model(self.cfg)
        self.aug = T.ResizeShortestEdge(
            [cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MIN_SIZE_TEST], cfg.INPUT.MAX_SIZE_TEST
        )
        self.input_format = cfg.INPUT.FORMAT
        assert self.input_format in ["RGB", "BGR"], self.input_format
        self.buckets = [tuple(b) for b in cfg.TPU.IMAGE_BUCKETS]

        # init variables at the largest bucket, load weights
        bh = max(b[0] for b in self.buckets)
        bw = max(b[1] for b in self.buckets)
        dummy = {
            "image": jnp.zeros((1, bh, bw, 3), jnp.float32),
            "image_sizes": jnp.asarray([[bh, bw]], jnp.int32),
            "orig_sizes": jnp.asarray([[bh, bw]], jnp.int32),
        }
        rng = jax.random.key(0)
        variables = jax.jit(
            lambda r: self.model.init({"params": r, "sampling": r}, dummy, train=False)
        )(rng)
        checkpointer = DetectionCheckpointer(dict(variables))
        checkpointer.load(cfg.MODEL.WEIGHTS)
        self.variables = checkpointer.variables
        self._jitted = jax.jit(lambda v, b: self.model.apply(v, b, train=False))
        self._int8_scopes = tuple(cfg.TPU.get("INT8_SCOPES", []))
        self._calibrated = not self._int8_scopes

    def __call__(self, original_image: np.ndarray) -> Dict[str, np.ndarray]:
        if self.input_format == "RGB":
            original_image = original_image[:, :, ::-1]
        height, width = original_image.shape[:2]
        image = self.aug.get_transform(original_image).apply_image(original_image)
        h, w = image.shape[:2]
        bh, bw = pick_bucket(h, w, self.buckets)
        canvas = np.zeros((bh, bw, 3), np.float32)
        canvas[:h, :w] = image
        batch = {
            "image": jnp.asarray(canvas[None]),
            "image_sizes": jnp.asarray([[h, w]], jnp.int32),
            "orig_sizes": jnp.asarray([[height, width]], jnp.int32),
        }
        if not self._calibrated:
            # lazy int8 calibration (cfg.TPU.INT8_SCOPES) on the first
            # real image; subsequent calls run the quantized convs
            from ..export.quantize import calibrate_int8

            quant = calibrate_int8(
                self.model, self.variables, [batch], scopes=self._int8_scopes
            )
            self.variables = {**self.variables, "quant": quant}
            logger.info(f"int8 conv scopes calibrated: {self._int8_scopes}")
            self._calibrated = True
        out = self._jitted(self.variables, batch)
        result = {k: np.asarray(v)[0] for k, v in out.items()}
        if "boxes" in result:  # reference API parity: Instances view
            from ..modeling.instances_io import batched_outputs_to_instances

            result["instances"] = batched_outputs_to_instances(
                {k: np.asarray(v) for k, v in out.items()},
                0,
                (height, width),
                paste_masks=True,
            )
        return result


class DefaultTrainer(TrainerBase):
    """Reference defaults.py:271 — builds everything from cfg and trains with
    the standard hook set."""

    def __init__(self, cfg: CfgNode):
        super().__init__()
        cfg = DefaultTrainer.auto_scale_workers(cfg, comm.get_world_size())
        self.cfg = cfg
        self.model = self.build_model(cfg)
        self.data_loader = self.build_train_loader(cfg)

        # init model state from one example batch
        self._loader_iter = iter(self.data_loader)
        example = next(self._loader_iter)
        example = {k: v for k, v in example.items() if k != "image_ids"}
        rng = jax.random.key(max(cfg.SEED, 0))
        init_rng, sample_rng, state_rng = jax.random.split(rng, 3)
        variables = jax.jit(
            lambda r, s: self.model.init({"params": r, "sampling": s}, example, train=True)
        )(init_rng, sample_rng)
        self.tx = self.build_optimizer(cfg, variables["params"])
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            frozen=variables.get("frozen", {}),
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            rng=state_rng,
        )
        # data mesh over as many devices as the per-host batch divides into
        local_batch = cfg.SOLVER.IMS_PER_BATCH // comm.get_world_size()
        n_dev = jax.device_count()
        while n_dev > 1 and local_batch % n_dev != 0:
            n_dev -= 1
        mesh = (
            build_mesh(devices=jax.devices()[:n_dev], axis_names=("data",), shape=(n_dev,))
            if n_dev > 1
            else None
        )
        self._trainer = SimpleTrainer(
            self.model, self.data_loader, self.tx, state, mesh, fsdp=cfg.TPU.FSDP
        )
        # reuse the example batch by chaining iterators
        import itertools

        self._trainer._data_loader_iter = itertools.chain(
            [dict(example)], self._trainer._data_loader_iter
        )
        self._trainer.checkpointer = DetectionCheckpointer(
            self._trainer.state_variables(), cfg.OUTPUT_DIR
        )
        self.checkpointer = self._trainer.checkpointer
        self.start_iter = 0
        self.max_iter = cfg.SOLVER.MAX_ITER
        self.register_hooks(self.build_hooks())

    # -- builders (overridable like the reference) -------------------------
    @classmethod
    def build_model(cls, cfg):
        model = build_model(cfg)
        logger.info(f"Model:\n{model}")
        return model

    @classmethod
    def build_optimizer(cls, cfg, params):
        """Reference defaults.py:430 (``DefaultTrainer.build_optimizer``)."""
        return build_optimizer(cfg, params)

    @classmethod
    def build_train_loader(cls, cfg):
        return build_detection_train_loader(cfg)

    @classmethod
    def build_test_loader(cls, cfg, dataset_name):
        return build_detection_test_loader(
            cfg, dataset_name, batch_size=max(1, cfg.TEST.IMS_PER_BATCH)
        )

    @classmethod
    def build_evaluator(cls, cfg, dataset_name, output_folder=None):
        if output_folder is None:
            output_folder = os.path.join(cfg.OUTPUT_DIR, "inference")
        evaluator_type = MetadataCatalog.get(dataset_name).get("evaluator_type", "coco")
        evaluators = []
        if (
            evaluator_type == "coco"
            and cfg.MODEL.META_ARCHITECTURE == "ProposalNetwork"
        ):
            # RPN-only models emit proposals, not detections: proposal AR
            # (reference coco_evaluation.py _evaluate_box_proposals drive)
            from ..evaluation import COCOProposalEvaluator

            evaluators.append(COCOProposalEvaluator(dataset_name))
        elif evaluator_type in ("coco", "coco_panoptic_seg"):
            evaluators.append(
                COCOEvaluator(
                    dataset_name,
                    output_dir=output_folder,
                    kpt_oks_sigmas=cfg.TEST.KEYPOINT_OKS_SIGMAS,
                )
            )
        if evaluator_type in ("sem_seg", "coco_panoptic_seg"):
            evaluators.append(SemSegEvaluator(dataset_name, output_dir=output_folder))
        if evaluator_type == "coco_panoptic_seg":
            # reference tools/train_net.py:54-86 — PQ on the fused output
            from ..evaluation import COCOPanopticEvaluator

            evaluators.append(
                COCOPanopticEvaluator(dataset_name, output_dir=output_folder)
            )
        if evaluator_type == "pascal_voc":
            evaluators.append(PascalVOCDetectionEvaluator(dataset_name))
        if evaluator_type == "lvis":
            from ..evaluation import LVISEvaluator

            evaluators.append(LVISEvaluator(dataset_name, output_dir=output_folder))
        if evaluator_type == "cityscapes_instance":
            from ..evaluation import CityscapesInstanceEvaluator

            evaluators.append(CityscapesInstanceEvaluator(dataset_name))
        if evaluator_type == "cityscapes_sem_seg":
            from ..evaluation import CityscapesSemSegEvaluator

            evaluators.append(CityscapesSemSegEvaluator(dataset_name))
        if len(evaluators) == 0:
            raise NotImplementedError(
                f"No evaluator for dataset {dataset_name} with type {evaluator_type}"
            )
        if len(evaluators) == 1:
            return evaluators[0]
        return DatasetEvaluators(evaluators)

    def build_hooks(self):
        cfg = self.cfg
        ret = [
            hooks.IterationTimer(),
            hooks.LRScheduler(build_lr_schedule(cfg)),
            hooks.PeriodicCheckpointerHook(
                PeriodicCheckpointer(self.checkpointer, cfg.SOLVER.CHECKPOINT_PERIOD, cfg.SOLVER.MAX_ITER)
            ),
        ]

        def test_and_save_results():
            self._last_eval_results = self.test(self.cfg, self.model, variables=self._trainer.state_variables())
            return self._last_eval_results

        if cfg.VIS_PERIOD > 0:
            # training-sample visualization to TensorBoard (reference
            # rcnn.py visualize_training driven by cfg.VIS_PERIOD)
            ret.append(hooks.TrainingVisualizationHook(cfg.VIS_PERIOD))

        if cfg.TEST.PRECISE_BN.ENABLED and jax.tree_util.tree_leaves(
            self._trainer.state.batch_stats
        ):
            # recompute population BN stats before each eval (reference
            # defaults.py build_hooks PreciseBN; no-op without BN stats)
            ret.append(
                hooks.PreciseBN(
                    cfg.TEST.EVAL_PERIOD, cfg.TEST.PRECISE_BN.NUM_ITER
                )
            )

        if cfg.TEST.EVAL_PERIOD > 0:
            ret.append(hooks.EvalHook(cfg.TEST.EVAL_PERIOD, test_and_save_results))

        if comm.is_main_process():
            ret.append(hooks.PeriodicWriter(self.build_writers(), period=20))
        return ret

    def build_writers(self):
        return [
            CommonMetricPrinter(self.max_iter),
            JSONWriter(os.path.join(self.cfg.OUTPUT_DIR, "metrics.json")),
            TensorboardXWriter(self.cfg.OUTPUT_DIR),
        ]

    # -- runtime -----------------------------------------------------------
    def resume_or_load(self, resume: bool = True):
        extra = self.checkpointer.resume_or_load(self.cfg.MODEL.WEIGHTS, resume=resume)
        loaded = self.checkpointer.variables
        state = self._trainer.state
        replacements = dict(
            params=loaded.get("params", state.params),
            frozen=loaded.get("frozen", state.frozen),
            batch_stats=loaded.get("batch_stats", state.batch_stats),
        )
        if resume:
            # continue the exact trajectory: momentum buffers + optax
            # schedule counters + the sampling rng stream (saved as
            # checkpointables by SimpleTrainer.sync_checkpointer; they land
            # in ``extra`` on a fresh-trainer resume)
            opt_state = extra.pop("opt_state", None)
            if opt_state is None:
                opt_state = self.checkpointer.checkpointables.get("opt_state")
            if opt_state is not None:
                replacements["opt_state"] = jax.tree_util.tree_map(
                    jnp.asarray, opt_state
                )
            rng = extra.pop("rng", None)
            if rng is None:
                rng = self.checkpointer.checkpointables.get("rng")
            if rng is not None:
                replacements["rng"] = jax.random.wrap_key_data(jnp.asarray(rng))
        self._trainer.state = state.replace(**replacements)
        if resume and "iteration" in extra:
            self.start_iter = int(extra["iteration"]) + 1

    def train(self):
        super().train(self.start_iter, self.max_iter)
        if comm.is_main_process() and hasattr(self, "_last_eval_results"):
            verify_results(self.cfg, self._last_eval_results)
            return self._last_eval_results

    def run_step(self):
        self._trainer.iter = self.iter
        self._trainer.storage = self.storage
        self._trainer.run_step()

    def sync_checkpointer(self):
        self._trainer.sync_checkpointer()

    def update_precise_bn(self, num_iter: int = 200):
        self._trainer.update_precise_bn(num_iter)

    @property
    def last_batch(self):
        return getattr(self._trainer, "last_batch", None)

    @property
    def state(self):
        return self._trainer.state

    @classmethod
    def test_with_TTA(cls, cfg, model, variables):
        """Reference train_net.py / defaults.py TTA eval path: per-image
        multi-scale + flip, union-NMS merge, COCO evaluation."""
        from ..evaluation import COCOEvaluator, inference_on_dataset
        from ..modeling.test_time_augmentation import GeneralizedRCNNWithTTA

        jitted = jax.jit(lambda v, b: model.apply(v, b, train=False))

        def predict(batch):
            return jitted(variables, {k: jnp.asarray(v) for k, v in batch.items()})

        tta = GeneralizedRCNNWithTTA(
            predict,
            min_sizes=tuple(cfg.TEST.AUG.MIN_SIZES),
            max_size=cfg.TEST.AUG.MAX_SIZE,
            flip=cfg.TEST.AUG.FLIP,
            buckets=[tuple(b) for b in cfg.TPU.IMAGE_BUCKETS],
        )
        results = OrderedDict()
        for dataset_name in cfg.DATASETS.TEST:
            from ..data import DatasetCatalog
            from ..data.detection_utils import read_image

            evaluator = cls.build_evaluator(cfg, dataset_name)
            evaluator.reset()
            for d in DatasetCatalog.get(dataset_name):
                img = read_image(d["file_name"], cfg.INPUT.FORMAT)
                merged = tta(img.astype(np.float32))
                n = len(merged["boxes"])
                outputs = {
                    "boxes": merged["boxes"][None],
                    "scores": merged["scores"][None],
                    "classes": merged["classes"][None],
                    "valid": np.ones((1, n), bool),
                }
                inputs = {
                    "image_ids": np.asarray([d.get("image_id", -1)]),
                    "orig_sizes": np.asarray([[d["height"], d["width"]]]),
                }
                evaluator.process(inputs, outputs)
            results[dataset_name] = evaluator.evaluate() or {}
        if len(results) == 1:
            results = list(results.values())[0]
        return results

    @classmethod
    def test(cls, cfg, model, evaluators=None, variables=None):
        """Reference defaults.py:504."""
        if cfg.TEST.AUG.ENABLED:
            return cls.test_with_TTA(cfg, model, variables)
        results = OrderedDict()
        eval_bs = max(1, cfg.TEST.IMS_PER_BATCH)
        # shard the eval batch over the data mesh when it divides across
        # devices (TPU-native analog of the reference's 1-image-per-GPU
        # distributed eval; 1 device => plain jit)
        n_dev = 1
        for d in range(min(eval_bs, jax.device_count()), 0, -1):
            if eval_bs % d == 0:
                n_dev = d
                break
        fn = lambda v, b: model.apply(v, b, train=False)  # noqa: E731
        if n_dev > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = build_mesh(
                devices=jax.devices()[:n_dev], axis_names=("data",), shape=(n_dev,)
            )
            jitted = jax.jit(
                fn,
                in_shardings=(
                    NamedSharding(mesh, P()),
                    NamedSharding(mesh, P("data")),
                ),
            )
        else:
            jitted = jax.jit(fn)

        # optional post-training int8 (cfg.TPU.INT8_SCOPES): calibrate the
        # conv activation scales on the first eval batch, then every later
        # batch runs the quantized convs
        int8_state = {
            "variables": variables,
            "todo": tuple(cfg.TPU.get("INT8_SCOPES", [])) if variables is not None else (),
        }

        for idx, dataset_name in enumerate(cfg.DATASETS.TEST):
            data_loader = cls.build_test_loader(cfg, dataset_name)
            if evaluators is not None:
                evaluator = evaluators[idx]
            else:
                try:
                    evaluator = cls.build_evaluator(cfg, dataset_name)
                except NotImplementedError:
                    logger.warning("No evaluator found; computing nothing.")
                    results[dataset_name] = {}
                    continue

            combine_on = (
                cfg.MODEL.PANOPTIC_FPN.COMBINE.ENABLED
                and MetadataCatalog.get(dataset_name).get("evaluator_type")
                == "coco_panoptic_seg"
            )

            def predict(batch):
                device_batch = {
                    k: jnp.asarray(v)
                    for k, v in batch.items()
                    if k not in ("image_ids",)
                }
                if int8_state["todo"]:
                    from ..export.quantize import calibrate_int8

                    quant = calibrate_int8(
                        model,
                        int8_state["variables"],
                        [device_batch],
                        scopes=int8_state["todo"],
                    )
                    int8_state["variables"] = {
                        **int8_state["variables"],
                        "quant": quant,
                    }
                    logger.info(f"int8 conv scopes calibrated: {int8_state['todo']}")
                    int8_state["todo"] = ()
                out = jitted(int8_state["variables"], device_batch)
                nreal = len(batch["image_ids"])
                if nreal < batch["image"].shape[0]:
                    # final partial batch was padded (loader pad_final):
                    # trim the duplicate rows before the evaluators see them
                    out = {k: v[:nreal] for k, v in out.items()}
                    batch = {
                        k: (v[:nreal] if getattr(v, "ndim", 0) else v)
                        for k, v in batch.items()
                    }
                if combine_on and "sem_seg_logits" in out and "boxes" in out:
                    # host-side panoptic fusion (reference PanopticFPN
                    # .inference :109-130 / MCNN._postprocess_ps)
                    from ..modeling.meta_arch.panoptic_fpn import (
                        panoptic_fusion_postprocess,
                    )

                    np_out = {k: np.asarray(v) for k, v in out.items()}
                    out = panoptic_fusion_postprocess(
                        np_out,
                        np.asarray(batch["image_sizes"]),
                        np.asarray(batch.get("orig_sizes", batch["image_sizes"])),
                        cfg.MODEL.PANOPTIC_FPN.COMBINE.OVERLAP_THRESH,
                        cfg.MODEL.PANOPTIC_FPN.COMBINE.STUFF_AREA_LIMIT,
                        cfg.MODEL.PANOPTIC_FPN.COMBINE.INSTANCES_CONFIDENCE_THRESH,
                    )
                cls.on_test_outputs(cfg, batch, out, dataset_name)
                return out

            results_i = inference_on_dataset(predict, data_loader, evaluator)
            results[dataset_name] = results_i
            if comm.is_main_process():
                assert isinstance(results_i, dict)
                print_csv_format(results_i)

        if len(results) == 1:
            results = list(results.values())[0]
        return results

    @classmethod
    def on_test_outputs(cls, cfg, batch, outputs, dataset_name):
        """Hook called with each inference batch's raw outputs during
        ``test`` — extension point for test-time visualization (the WSL
        trainer uses it for cfg.WSL.VIS_TEST, matching the reference heads'
        ``vis_test`` debug dumps). Default: no-op."""

    @staticmethod
    def auto_scale_workers(cfg: CfgNode, num_workers: int) -> CfgNode:
        """Reference defaults.py:556 — linear scaling rule."""
        old_world_size = cfg.SOLVER.REFERENCE_WORLD_SIZE
        if old_world_size == 0 or old_world_size == num_workers:
            return cfg
        cfg = cfg.clone()
        frozen = cfg.is_frozen()
        cfg.defrost()

        assert cfg.SOLVER.IMS_PER_BATCH % old_world_size == 0
        scale = num_workers / old_world_size
        cfg.SOLVER.IMS_PER_BATCH = int(round(cfg.SOLVER.IMS_PER_BATCH * scale))
        cfg.SOLVER.BASE_LR = cfg.SOLVER.BASE_LR * scale
        cfg.SOLVER.MAX_ITER = int(round(cfg.SOLVER.MAX_ITER / scale))
        cfg.SOLVER.WARMUP_ITERS = int(round(cfg.SOLVER.WARMUP_ITERS / scale))
        cfg.SOLVER.STEPS = tuple(int(round(s / scale)) for s in cfg.SOLVER.STEPS)
        cfg.TEST.EVAL_PERIOD = int(round(cfg.TEST.EVAL_PERIOD / scale))
        cfg.SOLVER.CHECKPOINT_PERIOD = int(round(cfg.SOLVER.CHECKPOINT_PERIOD / scale))
        cfg.SOLVER.REFERENCE_WORLD_SIZE = num_workers
        logger.info(f"Auto-scaling the config to batch_size={cfg.SOLVER.IMS_PER_BATCH}.")
        if frozen:
            cfg.freeze()
        return cfg
