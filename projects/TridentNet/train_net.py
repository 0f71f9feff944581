#!/usr/bin/env python
"""TridentNet training CLI (reference: projects/TridentNet/train_net.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import tridentnet  # noqa: F401 — registers trident backbone/RPN/heads
from tridentnet import add_tridentnet_config

from jtsm_tpu.engine import project_cli

if __name__ == "__main__":
    project_cli(add_tridentnet_config)
