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


def flop_count_analytic(fn, *args) -> Dict[str, float]:
    """Analytic FLOP count (reference detectron2/utils/analysis.py /
    fvcore ``FlopCountAnalysis``): walk the traced jaxpr and count
    multiply-accumulates of matmuls (``dot_general``) and convolutions
    (``conv_general_dilated``) as 2 FLOPs each. Complements ``flop_count``
    (XLA's own cost model) with a backend-independent per-primitive
    breakdown.

    Returns {"total_gflops": t, "dot_gflops": d, "conv_gflops": c}.
    Handles nested jaxprs (pjit/remat/custom_*), multiplies ``scan`` bodies
    by their trip count, and takes the max branch of ``cond``.
    """
    import jax.numpy as jnp  # noqa: F401

    jaxpr = jax.make_jaxpr(fn)(*args)

    def prod(xs):
        out = 1
        for x in xs:
            out *= int(x)
        return out

    def eqn_flops(eqn) -> Dict[str, float]:
        name = eqn.primitive.name
        if name == "dot_general":
            ((lc, _), (_, _)) = eqn.params["dimension_numbers"]
            k = prod(eqn.invars[0].aval.shape[i] for i in lc)
            return {"dot": 2.0 * prod(eqn.outvars[0].aval.shape) * k}
        if name == "conv_general_dilated":
            dn = eqn.params["dimension_numbers"]
            rhs_shape = eqn.invars[1].aval.shape
            # per output element: in_ch/groups * prod(kernel spatial) MACs
            per_out = prod(rhs_shape[i] for i in dn.rhs_spec[1:])
            return {"conv": 2.0 * prod(eqn.outvars[0].aval.shape) * per_out}
        total: Dict[str, float] = {}

        def add(d, mult=1.0):
            for k, v in d.items():
                total[k] = total.get(k, 0.0) + v * mult

        if name == "scan":
            add(jaxpr_flops(eqn.params["jaxpr"].jaxpr), float(eqn.params["length"]))
        elif name == "while":
            add(jaxpr_flops(eqn.params["body_jaxpr"].jaxpr))  # >= 1 trip
        elif name == "cond":
            branches = [jaxpr_flops(b.jaxpr) for b in eqn.params["branches"]]
            if branches:
                worst = max(branches, key=lambda d: sum(d.values()))
                add(worst)
        else:
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    add(jaxpr_flops(v.jaxpr))
                elif isinstance(v, (list, tuple)):
                    for vv in v:
                        if hasattr(vv, "jaxpr"):
                            add(jaxpr_flops(vv.jaxpr))
        return total

    def jaxpr_flops(jxp) -> Dict[str, float]:
        total: Dict[str, float] = {}
        for eqn in jxp.eqns:
            for k, v in eqn_flops(eqn).items():
                total[k] = total.get(k, 0.0) + v
        return total

    counts = jaxpr_flops(jaxpr.jaxpr)
    dot = counts.get("dot", 0.0) / 1e9
    conv = counts.get("conv", 0.0) / 1e9
    return {"total_gflops": dot + conv, "dot_gflops": dot, "conv_gflops": conv}


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


def _init_variables(model, inputs, train=False):
    rng = jax.random.key(0)
    return jax.jit(
        lambda r: model.init({"params": r, "sampling": r}, inputs, train=train)
    )(rng)


def flop_count_operators(model, inputs, variables=None, train: bool = False):
    """Per-operator GFLOP counts of a built model on one batch (reference
    utils/analysis.py:53 ``flop_count_operators``). ``model`` is a flax
    meta-arch module; ``inputs`` the batch dict; ``variables`` initialized
    with a fixed seed when not given. Keys: ``conv``, ``dot`` (the reference
    reports conv/addmm/einsum etc. — on TPU everything lowers to these two)."""
    import collections

    if variables is None:
        variables = _init_variables(model, inputs, train=train)
    counts = flop_count_analytic(
        lambda v, b: model.apply(v, b, train=train), variables, inputs
    )
    return collections.defaultdict(
        float, {"conv": counts["conv_gflops"], "dot": counts["dot_gflops"]}
    )


def activation_count_operators(model, inputs, variables=None, train: bool = False):
    """Per-operator activation counts in mega-elements (reference
    utils/analysis.py:76): number of output elements produced by each
    conv / matmul in the traced program."""
    import collections

    if variables is None:
        variables = _init_variables(model, inputs, train=train)
    jaxpr = jax.make_jaxpr(
        lambda v, b: model.apply(v, b, train=train)
    )(variables, inputs)

    totals = {"conv": 0.0, "dot": 0.0}

    def visit(jxp, mult=1.0):
        for eqn in jxp.eqns:
            name = eqn.primitive.name
            if name == "conv_general_dilated":
                totals["conv"] += mult * float(np.prod(eqn.outvars[0].aval.shape))
            elif name == "dot_general":
                totals["dot"] += mult * float(np.prod(eqn.outvars[0].aval.shape))
            elif name == "scan":
                visit(eqn.params["jaxpr"].jaxpr, mult * float(eqn.params["length"]))
            else:
                for v in eqn.params.values():
                    if hasattr(v, "jaxpr"):
                        visit(v.jaxpr, mult)
                    elif isinstance(v, (list, tuple)):
                        for vv in v:
                            if hasattr(vv, "jaxpr"):
                                visit(vv.jaxpr, mult)

    visit(jaxpr.jaxpr)
    return collections.defaultdict(
        float, {k: v / 1e6 for k, v in totals.items()}
    )
