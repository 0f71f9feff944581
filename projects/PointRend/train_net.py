#!/usr/bin/env python
"""PointRend training CLI (reference: projects/PointRend/train_net.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import point_rend  # noqa: F401 — registers PointRend heads
from point_rend import ColorAugSSDTransform, add_pointrend_config

from jtsm_tpu.engine import DefaultTrainer, project_cli


class Trainer(DefaultTrainer):
    """Adds SSD color augmentation when INPUT.COLOR_AUG_SSD is on
    (reference projects/PointRend/train_net.py:36 build_train_loader)."""

    @classmethod
    def build_train_loader(cls, cfg):
        from jtsm_tpu.data import DatasetMapper, build_detection_train_loader
        from jtsm_tpu.data import detection_utils as utils

        if cfg.INPUT.COLOR_AUG_SSD:
            augs = DatasetMapper.from_config(cfg, is_train=True)["augmentations"]
            augs.append(ColorAugSSDTransform(img_format=cfg.INPUT.FORMAT))
            kwargs = DatasetMapper.from_config(cfg, is_train=True)
            kwargs["augmentations"] = augs
            mapper = DatasetMapper(**kwargs)
            return build_detection_train_loader(cfg, mapper=mapper)
        return build_detection_train_loader(cfg)


if __name__ == "__main__":
    project_cli(add_pointrend_config, trainer_cls=Trainer)
