"""TensorMask (reference: projects/TensorMask — dense sliding-window instance
segmentation with the SwapAlign2Nat representation transform)."""

from .config import add_tensormask_config
from .swap_align2nat import swap_align2nat

__all__ = ["add_tensormask_config", "swap_align2nat"]
