#!/usr/bin/env python
"""Panoptic-DeepLab training CLI (reference: projects/Panoptic-DeepLab/train_net.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import panoptic_deeplab  # noqa: F401 — registers the meta-arch + heads
from panoptic_deeplab import add_panoptic_deeplab_config

from jtsm_tpu.engine import project_cli

if __name__ == "__main__":
    project_cli(add_panoptic_deeplab_config)
