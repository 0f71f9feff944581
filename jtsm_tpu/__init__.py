"""jtsm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) detection, segmentation and
weakly-supervised panoptic framework with the capabilities of the reference
Detectron2 fork + JTSM project (see SURVEY.md)."""

__version__ = "0.1.0"

from .utils.env import setup_environment

# the reference runs environment setup at import (detectron2/__init__.py)
setup_environment()
