from .api import TPUTracer, export_stablehlo_model, export_tf_model

__all__ = ["TPUTracer", "export_stablehlo_model", "export_tf_model"]
