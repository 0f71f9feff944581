"""Panoptic-DeepLab dataset mapper (reference:
projects/Panoptic-DeepLab/panoptic_deeplab/dataset_mapper.py:19
``PanopticDeeplabDatasetMapper``).

Reads the panoptic PNG, applies the geometric augmentations to the id map,
and converts segments_info into the model's training targets: per-pixel
semantic labels plus gaussian center heatmap / center offsets from
``target_generator.panoptic_deeplab_targets``.
"""

from __future__ import annotations

import copy
import logging
from typing import Callable, List, Optional

import numpy as np

from jtsm_tpu.config import CfgNode, configurable
from jtsm_tpu.data import MetadataCatalog
from jtsm_tpu.data import detection_utils as utils
from jtsm_tpu.data import transforms as T
from jtsm_tpu.evaluation.panoptic_evaluation import rgb2id

from .target_generator import panoptic_deeplab_targets

logger = logging.getLogger(__name__)


class PanopticDeeplabDatasetMapper:
    @configurable
    def __init__(
        self,
        *,
        augmentations: List,
        image_format: str,
        ignore_label: int,
        thing_ids: List[int],
        sigma: float = 8.0,
        ignore_stuff_in_offset: bool = True,
        small_instance_area: int = 0,
        small_instance_weight: float = 1.0,
        ignore_crowd_in_semantic: bool = False,
    ):
        self.augmentations = T.AugmentationList(augmentations)
        self.image_format = image_format
        self.ignore_label = ignore_label
        self.thing_ids = set(thing_ids)
        self.sigma = sigma
        self.ignore_stuff_in_offset = ignore_stuff_in_offset
        self.small_instance_area = small_instance_area
        self.small_instance_weight = small_instance_weight
        self.ignore_crowd_in_semantic = ignore_crowd_in_semantic
        logger.info(
            "[PanopticDeeplabDatasetMapper] augmentations: %s", augmentations
        )

    @classmethod
    def from_config(cls, cfg: CfgNode):
        augs = [
            T.ResizeShortestEdge(
                cfg.INPUT.MIN_SIZE_TRAIN,
                cfg.INPUT.MAX_SIZE_TRAIN,
                cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING,
            )
        ]
        if cfg.INPUT.CROP.ENABLED:
            augs.append(T.RandomCrop(cfg.INPUT.CROP.TYPE, cfg.INPUT.CROP.SIZE))
        augs.append(T.RandomFlip())
        meta = MetadataCatalog.get(cfg.DATASETS.TRAIN[0])
        thing_map = getattr(meta, "thing_dataset_id_to_contiguous_id", {}) or {}
        return {
            "augmentations": augs,
            "image_format": cfg.INPUT.FORMAT,
            "ignore_label": cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            "thing_ids": sorted(thing_map.values()),
            "sigma": cfg.INPUT.GAUSSIAN_SIGMA,
            "ignore_stuff_in_offset": cfg.INPUT.IGNORE_STUFF_IN_OFFSET,
            "small_instance_area": cfg.INPUT.SMALL_INSTANCE_AREA,
            "small_instance_weight": cfg.INPUT.SMALL_INSTANCE_WEIGHT,
            "ignore_crowd_in_semantic": cfg.INPUT.IGNORE_CROWD_IN_SEMANTIC,
        }

    def __call__(self, dataset_dict: dict) -> dict:
        dataset_dict = copy.deepcopy(dataset_dict)
        image = utils.read_image(dataset_dict["file_name"], format=self.image_format)
        utils.check_image_size(dataset_dict, image)

        from PIL import Image

        pan_seg = np.asarray(Image.open(dataset_dict.pop("pan_seg_file_name")))
        if pan_seg.ndim == 3:
            pan_seg = rgb2id(pan_seg)
        pan_seg = pan_seg.astype(np.int64)

        aug_input = T.AugInput(image)
        transforms = self.augmentations(aug_input)
        image = aug_input.image
        # nearest-resample the id map through the same geometric transforms;
        # ids < 2**24 survive the float32 round-trip exactly
        pan_seg = (
            transforms.apply_segmentation(pan_seg.astype(np.float32))
            .round()
            .astype(np.int64)
        )

        h, w = image.shape[:2]
        sem_seg = np.full((h, w), self.ignore_label, np.int64)
        segments = dataset_dict.pop("segments_info", [])
        inst_masks = []
        for seg in segments:
            mask = pan_seg == seg["id"]
            crowd = seg.get("iscrowd", 0)
            if not (crowd and self.ignore_crowd_in_semantic):
                sem_seg[mask] = seg["category_id"]
            if seg["category_id"] in self.thing_ids and not crowd:
                inst_masks.append(mask)

        if inst_masks:
            masks = np.stack(inst_masks)
        else:
            masks = np.zeros((0, h, w), bool)
        targets = panoptic_deeplab_targets(
            masks,
            np.ones(len(inst_masks), bool),
            sigma=self.sigma,
            sem_seg=sem_seg,
            ignore_label=self.ignore_label,
            ignore_stuff_in_offset=self.ignore_stuff_in_offset,
            small_instance_area=self.small_instance_area,
            small_instance_weight=self.small_instance_weight,
        )

        dataset_dict["image"] = np.ascontiguousarray(image.astype(np.float32))
        dataset_dict["sem_seg"] = sem_seg
        dataset_dict.update(targets)
        return dataset_dict
