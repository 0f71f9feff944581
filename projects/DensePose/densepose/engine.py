"""DensePose trainer with bootstrapping (reference:
projects/DensePose/densepose/engine/trainer.py ``Trainer`` — when
BOOTSTRAP_DATASETS is set, the train loader is a CombinedDataLoader mixing
the annotated loader with inference-based pseudo-GT loaders built from
unlabeled images/videos).
"""

from __future__ import annotations

import logging
from typing import List

from jtsm_tpu.config import CfgNode
from jtsm_tpu.engine import DefaultTrainer

from .config import load_bootstrap_config
from .data_samplers import (
    DensePoseConfidenceBasedSampler,
    DensePoseUniformSampler,
    PredictionToGroundTruthSampler,
)
from .video import (
    CombinedDataLoader,
    ImageListDataset,
    InferenceBasedLoader,
    RandomKFramesSelector,
    VideoKeyframeDataset,
)

logger = logging.getLogger(__name__)


def build_data_sampler(sampler_cfg: CfgNode) -> PredictionToGroundTruthSampler:
    """Reference engine/trainer.py build_data_sampler."""
    p2g = PredictionToGroundTruthSampler()
    stype = sampler_cfg.DATA_SAMPLER.TYPE
    count = sampler_cfg.DATA_SAMPLER.get("COUNT_PER_CLASS", 8)
    if stype == "densepose_uniform":
        p2g.register_sampler("densepose", DensePoseUniformSampler(count))
    elif stype == "densepose_UV_confidence":
        p2g.register_sampler(
            "densepose",
            DensePoseConfidenceBasedSampler(
                confidence_channel="sigma_2",
                count_per_class=count,
                search_count_multiplier=sampler_cfg.DATA_SAMPLER.get(
                    "SEARCH_COUNT_MULTIPLIER", 4.0
                ),
            ),
        )
    else:
        raise ValueError(f"Unknown data sampler type {stype}")
    return p2g


def build_image_loader(loader_cfg: CfgNode):
    """Reference engine/trainer.py build_image_loader: image lists or video
    keyframes from the dataset's file list."""
    from jtsm_tpu.data import DatasetCatalog

    entries = DatasetCatalog.get(loader_cfg.DATASET)
    files = [e["file_name"] if isinstance(e, dict) else e for e in entries]
    if loader_cfg.IMAGE_LOADER.TYPE == "video_keyframe":
        sel = loader_cfg.IMAGE_LOADER.get("SELECT", {})
        k = sel.get("NUM_IMAGES", 1) if hasattr(sel, "get") else 1
        return VideoKeyframeDataset(files, frame_selector=RandomKFramesSelector(k))
    return ImageListDataset(files)


def build_bootstrap_loaders(cfg: CfgNode, predictor) -> List:
    """One InferenceBasedLoader per bootstrap dataset entry."""
    load_bootstrap_config(cfg)
    loaders = []
    ratios = []
    for ds_cfg in cfg.BOOTSTRAP_DATASETS:
        image_loader = build_image_loader(ds_cfg)
        sampler = build_data_sampler(ds_cfg)
        min_score = ds_cfg.FILTER.get("MIN_VALUE", 0.0) if ds_cfg.FILTER.TYPE else 0.0

        def filtered_predictor(image, _p=predictor, _t=min_score):
            """Score-based detection filter (reference
            data/filters/detection_score.py ``ScoreBasedFilter``): drop
            detections below MIN_VALUE before pseudo-GT sampling by
            clearing their validity."""
            import numpy as np

            outputs = dict(_p(image))
            if _t > 0.0 and "scores" in outputs and "valid" in outputs:
                outputs["valid"] = np.asarray(outputs["valid"]) & (
                    np.asarray(outputs["scores"]) >= _t
                )
            return outputs

        loaders.append(
            InferenceBasedLoader(
                filtered_predictor,
                image_loader,
                data_sampler=sampler,
                batch_size=ds_cfg.INFERENCE.OUTPUT_BATCH_SIZE,
            )
        )
        ratios.append(ds_cfg.RATIO)
    return loaders, ratios


class Trainer(DefaultTrainer):
    """Reference densepose/engine/trainer.py: combined annotated +
    bootstrapped loaders when BOOTSTRAP_DATASETS is configured, plus the
    DensePose evaluator stack (box AP + GPS + GPSm) for datasets whose
    evaluator_type is "densepose" (reference Trainer.build_evaluator)."""

    @classmethod
    def build_evaluator(cls, cfg: CfgNode, dataset_name: str, output_folder=None):
        from jtsm_tpu.data.catalog import MetadataCatalog

        if MetadataCatalog.get(dataset_name).get("evaluator_type") == "densepose":
            import os

            from jtsm_tpu.evaluation import COCOEvaluator, DatasetEvaluators

            from .evaluation import DensePoseCOCOEvaluator

            if output_folder is None:
                output_folder = os.path.join(cfg.OUTPUT_DIR, "inference")
            return DatasetEvaluators(
                [
                    COCOEvaluator(dataset_name, output_dir=output_folder),
                    DensePoseCOCOEvaluator(dataset_name, eval_mode="gps"),
                    DensePoseCOCOEvaluator(dataset_name, eval_mode="gpsm"),
                ]
            )
        return super().build_evaluator(cfg, dataset_name, output_folder)

    @classmethod
    def build_train_loader(cls, cfg: CfgNode):
        from jtsm_tpu.data import build_detection_train_loader

        from .data import DatasetMapperDensePose

        mapper = None
        if cfg.MODEL.DENSEPOSE_ON:
            mapper = DatasetMapperDensePose(cfg, True)
            mapper.max_dp_points = cfg.MODEL.ROI_DENSEPOSE_HEAD.MAX_DP_POINTS
        base_loader = build_detection_train_loader(cfg, mapper=mapper)
        if not cfg.BOOTSTRAP_DATASETS:
            return base_loader
        logger.info(
            f"Building combined loader with {len(cfg.BOOTSTRAP_DATASETS)} "
            "bootstrap dataset(s)"
        )
        from jtsm_tpu.engine import DefaultPredictor

        model_cfg = cfg.clone()
        model_cfg.defrost()
        if cfg.BOOTSTRAP_MODEL.WEIGHTS:
            model_cfg.MODEL.WEIGHTS = cfg.BOOTSTRAP_MODEL.WEIGHTS
        predictor = DefaultPredictor(model_cfg)
        loaders, ratios = build_bootstrap_loaders(cfg, predictor)
        return CombinedDataLoader(
            [base_loader] + loaders,
            batch_size=cfg.SOLVER.IMS_PER_BATCH,
            ratios=[1.0 - sum(r / (1 + sum(ratios)) for r in ratios)]
            + [r / (1 + sum(ratios)) for r in ratios],
        )
