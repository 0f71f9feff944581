#!/usr/bin/env python
"""DensePose training CLI (reference: projects/DensePose/train_net.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import densepose  # noqa: F401 — registers DensePose heads/backbones
from densepose import add_densepose_config
from densepose.engine import Trainer

from jtsm_tpu.engine import project_cli

if __name__ == "__main__":
    project_cli(add_densepose_config, trainer_cls=Trainer)
