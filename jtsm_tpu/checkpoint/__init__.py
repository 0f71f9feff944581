from .c2_model_loading import (
    align_and_update_state_dict,
    convert_c2_detectron_names,
    convert_d2_state_dict_to_variables,
)
from .detection_checkpoint import DetectionCheckpointer, PeriodicCheckpointer

__all__ = [
    "DetectionCheckpointer",
    "PeriodicCheckpointer",
    "align_and_update_state_dict",
    "convert_c2_detectron_names",
    "convert_d2_state_dict_to_variables",
]
from .catalog import ModelCatalog
