from .api import TPUTracer, export_stablehlo_model, export_tf_model
from .quantize import calibrate_int8

__all__ = [
    "TPUTracer",
    "calibrate_int8",
    "export_stablehlo_model",
    "export_tf_model",
]
