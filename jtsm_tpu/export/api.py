"""Deployment export (reference: detectron2/export/api.py:43
``Caffe2Tracer`` -> caffe2/onnx/torchscript).

TPU re-design (SURVEY.md §7): Caffe2/TorchScript become **StableHLO** (the
portable XLA exchange format) and **TF SavedModel** via jax2tf. The traced
graph is the same static-shape inference function the TPU runs — no
re-implementation of the model in a tracing dialect (the reference needs
caffe2_modeling.py/c10.py shims; here the jitted function IS traceable).
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class TPUTracer:
    """Analog of Caffe2Tracer: wraps (model, variables, example batch)."""

    def __init__(self, cfg, model, variables, example_batch: Dict):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.example_batch = example_batch
        self._fn = lambda v, b: model.apply(v, b, train=False)

    def export_stablehlo(self, output_path: Optional[str] = None) -> str:
        """Serialize the inference computation as StableHLO text."""
        lowered = jax.jit(self._fn).lower(self.variables, self.example_batch)
        text = lowered.as_text()
        if output_path:
            os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
            with open(output_path, "w") as f:
                f.write(text)
            logger.info(f"StableHLO written to {output_path}")
        return text

    def export_jax_exported(self, output_path: Optional[str] = None) -> bytes:
        """jax.export serialized artifact (versioned, reload-able). Weights
        are closed over — baked into the artifact as constants — so the
        deserialized callable takes only the input batch (what a serving
        host wants; see tools/deploy/jtsm_infer.cpp)."""
        from jax import export as jax_export

        exported = jax_export.export(
            jax.jit(lambda b: self._fn(self.variables, b)),
            # multi-platform artifact: serve on TPU or CPU hosts alike
            platforms=("tpu", "cpu"),
        )(self.example_batch)
        blob = exported.serialize()
        if output_path:
            os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
            with open(output_path, "wb") as f:
                f.write(blob)
            logger.info(f"jax.export artifact written to {output_path}")
        return blob

    def export_tf_saved_model(self, output_dir: str):
        """TF SavedModel via jax2tf (replaces the reference's ONNX/TS export
        for serving stacks)."""
        import tensorflow as tf
        from jax.experimental import jax2tf

        tf_fn = jax2tf.convert(
            lambda b: self._fn(self.variables, b), with_gradient=False
        )
        module = tf.Module()
        spec = jax.tree_util.tree_map(
            lambda x: tf.TensorSpec(x.shape, tf.as_dtype(np.asarray(x).dtype)),
            self.example_batch,
        )
        module.f = tf.function(tf_fn, input_signature=[spec], autograph=False)
        tf.saved_model.save(module, output_dir)
        logger.info(f"TF SavedModel written to {output_dir}")
        return output_dir


def export_stablehlo_model(cfg, model, variables, example_batch, output_path=None) -> str:
    return TPUTracer(cfg, model, variables, example_batch).export_stablehlo(output_path)


def export_tf_model(cfg, model, variables, example_batch, output_dir) -> str:
    return TPUTracer(cfg, model, variables, example_batch).export_tf_saved_model(output_dir)
