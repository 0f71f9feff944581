#!/usr/bin/env python
"""DeepLab training CLI (reference: projects/DeepLab/train_net.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import deeplab  # noqa: F401 — registers DeepLab heads/backbone
from deeplab import add_deeplab_config

from jtsm_tpu.engine import project_cli

if __name__ == "__main__":
    project_cli(add_deeplab_config)
