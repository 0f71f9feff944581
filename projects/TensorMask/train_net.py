#!/usr/bin/env python
"""TensorMask training CLI (reference: projects/TensorMask/train_net.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import tensormask  # noqa: F401 — registers the TensorMask meta-arch
from tensormask import add_tensormask_config

from jtsm_tpu.engine import project_cli

if __name__ == "__main__":
    project_cli(add_tensormask_config)
