from .c2_model_loading import (
    align_and_update_state_dict,
    convert_c2_detectron_names,
    convert_d2_state_dict_to_variables,
)
from .detection_checkpoint import DetectionCheckpointer, PeriodicCheckpointer

# reference exposes the generic fvcore ``Checkpointer`` under this package;
# DetectionCheckpointer carries the full generic save/load surface here.
Checkpointer = DetectionCheckpointer

__all__ = [
    "Checkpointer",
    "DetectionCheckpointer",
    "PeriodicCheckpointer",
    "align_and_update_state_dict",
    "convert_c2_detectron_names",
    "convert_d2_state_dict_to_variables",
]
from .catalog import ModelCatalog
