"""Model analysis: parameter + FLOP counting (reference:
detectron2/utils/analysis.py, fvcore flop_count).

TPU re-design: XLA already knows the cost — we read it from the compiled
executable's cost analysis instead of re-deriving per-op tables."""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def parameter_count(params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))


def parameter_count_table(params, max_depth: int = 3) -> str:
    """Per-submodule parameter counts."""
    rows: Dict[str, int] = {}

    def visit(tree, prefix):
        for k, v in tree.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                visit(v, path)
            else:
                key = ".".join(path.split(".")[:max_depth])
                rows[key] = rows.get(key, 0) + int(np.prod(v.shape))

    visit(params, "")
    lines = [f"{'module':60s} #parameters"]
    for k in sorted(rows):
        lines.append(f"{k:60s} {rows[k]:,}")
    lines.append(f"{'TOTAL':60s} {sum(rows.values()):,}")
    return "\n".join(lines)


def flop_count(fn, *args) -> float:
    """Total FLOPs of a jitted callable on the given args, from XLA's cost
    analysis. Returns GFLOPs (may be -1 if the backend reports none)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", -1)) / 1e9
    except Exception:
        return -1.0


def activation_count(fn, *args) -> float:
    """Bytes accessed (proxy for activations), from XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("bytes accessed", -1)) / 1e9
    except Exception:
        return -1.0
