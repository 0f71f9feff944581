"""DatasetMapper: dataset dict -> model-ready per-image dict.

Reference: detectron2/data/dataset_mapper.py:20. Output image stays HWC
numpy (TPU layout); Instances fields are numpy and later collated into
static batches by ``detection_utils.build_static_batch``.
"""

from __future__ import annotations

import copy
import logging
from typing import List, Optional, Union

import numpy as np

from ..config import CfgNode, configurable
from ..structures import BoxMode
from . import detection_utils as utils
from . import transforms as T


class DatasetMapper:
    @configurable
    def __init__(
        self,
        is_train: bool,
        *,
        augmentations: List,
        image_format: str,
        use_instance_mask: bool = False,
        use_keypoint: bool = False,
        instance_mask_format: str = "polygon",
        keypoint_hflip_indices: Optional[np.ndarray] = None,
        precomputed_proposal_topk: Optional[int] = None,
        recompute_boxes: bool = False,
    ):
        if recompute_boxes:
            assert use_instance_mask, "recompute_boxes requires instance masks"
        self.is_train = is_train
        self.augmentations = T.AugmentationList(augmentations)
        self.image_format = image_format
        self.use_instance_mask = use_instance_mask
        self.instance_mask_format = instance_mask_format
        self.use_keypoint = use_keypoint
        self.keypoint_hflip_indices = keypoint_hflip_indices
        self.proposal_topk = precomputed_proposal_topk
        self.recompute_boxes = recompute_boxes
        logger = logging.getLogger(__name__)
        mode = "training" if is_train else "inference"
        logger.info(f"[DatasetMapper] Augmentations used in {mode}: {augmentations}")

    @classmethod
    def from_config(cls, cfg: CfgNode, is_train: bool = True):
        augs = utils.build_augmentation(cfg, is_train)
        if cfg.INPUT.CROP.ENABLED and is_train:
            if cfg.INPUT.CROP.SINGLE_CATEGORY_MAX_AREA < 1.0:
                augs.insert(
                    0,
                    T.RandomCrop_CategoryAreaConstraint(
                        cfg.INPUT.CROP.TYPE,
                        cfg.INPUT.CROP.SIZE,
                        cfg.INPUT.CROP.SINGLE_CATEGORY_MAX_AREA,
                        cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
                    ),
                )
            else:
                augs.insert(0, T.RandomCrop(cfg.INPUT.CROP.TYPE, cfg.INPUT.CROP.SIZE))
            recompute_boxes = cfg.MODEL.MASK_ON
        else:
            recompute_boxes = False
        ret = {
            "is_train": is_train,
            "augmentations": augs,
            "image_format": cfg.INPUT.FORMAT,
            "use_instance_mask": cfg.MODEL.MASK_ON,
            "instance_mask_format": cfg.INPUT.MASK_FORMAT,
            "use_keypoint": cfg.MODEL.KEYPOINT_ON,
            "recompute_boxes": recompute_boxes,
        }
        if cfg.MODEL.KEYPOINT_ON:
            ret["keypoint_hflip_indices"] = utils.create_keypoint_hflip_indices(
                cfg.DATASETS.TRAIN
            )
        if cfg.MODEL.LOAD_PROPOSALS:
            ret["precomputed_proposal_topk"] = (
                cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN
                if is_train
                else cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST
            )
        return ret

    def _transform_proposals(self, dataset_dict, image_shape, transforms):
        """Hook so project mappers can extend proposal handling (the WSL
        mapper adds superpixel maps + membership, wsl/data.py)."""
        utils.transform_proposals(
            dataset_dict, image_shape, transforms, proposal_topk=self.proposal_topk
        )

    def __call__(self, dataset_dict: dict) -> dict:
        dataset_dict = copy.deepcopy(dataset_dict)
        image = utils.read_image(dataset_dict["file_name"], format=self.image_format)
        utils.check_image_size(dataset_dict, image)

        if "sem_seg_file_name" in dataset_dict:
            from PIL import Image

            sem_seg_gt = np.asarray(
                Image.open(dataset_dict.pop("sem_seg_file_name")), dtype=np.uint8
            )
        else:
            sem_seg_gt = None

        aug_input = T.AugInput(image, sem_seg=sem_seg_gt)
        transforms = self.augmentations(aug_input)
        image, sem_seg_gt = aug_input.image, aug_input.sem_seg

        image_shape = image.shape[:2]
        dataset_dict["image"] = np.ascontiguousarray(image.astype(np.float32))
        if sem_seg_gt is not None:
            dataset_dict["sem_seg"] = sem_seg_gt.astype(np.int64)

        if self.proposal_topk is not None:
            self._transform_proposals(dataset_dict, image_shape, transforms)

        if not self.is_train:
            dataset_dict.pop("annotations", None)
            return dataset_dict

        if "annotations" in dataset_dict:
            for anno in dataset_dict["annotations"]:
                if not self.use_instance_mask:
                    anno.pop("segmentation", None)
                if not self.use_keypoint:
                    anno.pop("keypoints", None)

            annos = [
                utils.transform_instance_annotations(
                    obj,
                    transforms,
                    image_shape,
                    keypoint_hflip_indices=self.keypoint_hflip_indices,
                )
                for obj in dataset_dict.pop("annotations")
                if obj.get("iscrowd", 0) == 0
            ]
            instances = utils.annotations_to_instances(
                annos, image_shape, mask_format=self.instance_mask_format
            )
            if self.recompute_boxes and instances.has("gt_masks"):
                gm = instances.gt_masks
                instances.gt_boxes = np.asarray(gm.get_bounding_boxes().tensor)
            # project hook (e.g. DensePose attaches per-gt surface-point
            # fields); runs BEFORE filtering so the fields are sliced by
            # the same keep mask as every other instance field
            self._attach_extra_annotations(annos, instances, image_shape, transforms)
            dataset_dict["instances"] = utils.filter_empty_instances(instances)
        return dataset_dict

    def _attach_extra_annotations(self, annos, instances, image_shape, transforms):
        """Subclass hook: attach additional per-instance fields derived from
        the (transformed) annotations. Fields set on ``instances`` here are
        filtered/collated like the built-in gt_* fields."""
