"""Post-training int8 quantization for inference.

TPU MXUs run s8 x s8 -> s32 contractions at twice the bf16 rate, and the
inference hot path is conv-bound (docs/notes/benchmarks.md: ~57% of the
step is convolution fusions at the HBM/MXU roofline). This module provides
the calibration driver for :class:`jtsm_tpu.layers.wrappers.QuantableConv`:

1. run a few representative batches with the ``quant_calib`` collection
   mutable — every conv records its running activation abs-max;
2. convert the recorded abs-max tree into per-conv ``act_scale`` values
   (symmetric per-tensor activation scales; weights are quantized
   per-output-channel on the fly inside the conv);
3. keep only the scopes you want quantized (``cfg.TPU.INT8_SCOPES``, e.g.
   ``["backbone"]``) — convs without an ``act_scale`` keep running bf16.

The result is a ``quant`` variable collection to merge into the model's
apply variables::

    quant = calibrate_int8(model, variables, batches, scopes=("backbone",))
    out = model.apply({**variables, "quant": quant}, batch, train=False)

No reference counterpart (the reference serves fp32/fp16 via Caffe2 /
TensorRT export, detectron2/export/api.py:43); this is the TPU-native
deployment analog.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Sequence

import jax
import jax.numpy as jnp


def _to_scales(tree: Any) -> Any:
    """quant_calib {.. act_absmax ..} -> quant {.. act_scale ..}."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            if k == "act_absmax":
                out["act_scale"] = jnp.maximum(
                    jnp.asarray(v, jnp.float32) / 127.0, 1e-8
                )
            else:
                out[k] = _to_scales(v)
        return out
    return tree


def _filter_scopes(tree: Dict, scopes: Sequence[str]) -> Dict:
    """Keep only top-level module subtrees named in ``scopes`` (empty =
    keep everything)."""
    if not scopes:
        return tree
    return {k: v for k, v in tree.items() if k in set(scopes)}


def _prune_empty(tree: Any) -> Any:
    if isinstance(tree, dict):
        out = {k: _prune_empty(v) for k, v in tree.items()}
        return {k: v for k, v in out.items() if not (isinstance(v, dict) and not v)}
    return tree


def calibrate_int8(
    model,
    variables: Dict,
    batches: Iterable[Dict],
    scopes: Sequence[str] = ("backbone",),
    **apply_kwargs,
) -> Dict:
    """Record activation ranges over ``batches`` and return the ``quant``
    collection enabling the int8 conv path for ``scopes``.

    ``model.apply`` is called with ``train=False`` plus ``apply_kwargs``;
    batches must be the same mapping structure the model normally consumes.
    """
    stats: Dict = {}
    calib = jax.jit(
        lambda v, b: model.apply(v, b, train=False, mutable=["quant_calib"],
                                 **apply_kwargs)[1]["quant_calib"],
    )
    for batch in batches:
        v = dict(variables)
        if stats:
            v["quant_calib"] = stats
        stats = calib(v, batch)
    if not stats:
        raise ValueError("calibrate_int8: no batches were provided")
    quant = _prune_empty(_filter_scopes(_to_scales(stats), scopes))
    return quant
