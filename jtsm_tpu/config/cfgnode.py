"""Hierarchical, freezable configuration tree.

TPU-native re-design of the reference config system
(reference: detectron2/config/config.py:12 `CfgNode`, :84 `get_cfg`,
:115 `configurable`). We do not depend on yacs; this is a fresh
implementation with the same user-facing semantics:

* attribute access (``cfg.MODEL.WEIGHTS``)
* yaml serialization and loading with ``_BASE_`` file inheritance
  (reference: detectron2/config/config.py:29 ``merge_from_file``)
* ``merge_from_list`` for CLI ``KEY VALUE`` overrides
* ``freeze()`` / ``defrost()`` immutability
* ``@configurable`` bridging cfg-driven and explicit-kwarg construction
"""

from __future__ import annotations

import copy
import functools
import logging
import inspect
import os
from typing import Any, Dict, List

import yaml

logger = logging.getLogger(__name__)

_VALID_TYPES = (int, float, bool, str, type(None), tuple, list)

BASE_KEY = "_BASE_"


class CfgNode(dict):
    """A dict with attribute access, freezing, and yaml round-trip."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict: Dict | None = None):
        init_dict = {} if init_dict is None else init_dict
        super().__init__()
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        for k, v in init_dict.items():
            if isinstance(v, dict):
                v = CfgNode(v)
            dict.__setitem__(self, k, v)

    # -- attribute protocol ------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"Non-existent config key: {name}")

    def __setattr__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise AttributeError(
                f"Attempted to set {name} on an immutable CfgNode."
            )
        self[name] = value

    def __setitem__(self, name, value) -> None:
        if self.is_frozen():
            raise AttributeError(
                f"Attempted to set {name} on an immutable CfgNode."
            )
        if isinstance(value, dict) and not isinstance(value, CfgNode):
            value = CfgNode(value)
        dict.__setitem__(self, name, value)

    # -- mutability --------------------------------------------------------
    def is_frozen(self) -> bool:
        return getattr(self, CfgNode.IMMUTABLE)

    def _set_immutable(self, flag: bool) -> None:
        object.__setattr__(self, CfgNode.IMMUTABLE, flag)
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_immutable(flag)

    def freeze(self) -> "CfgNode":
        self._set_immutable(True)
        return self

    def defrost(self) -> "CfgNode":
        self._set_immutable(False)
        return self

    def clone(self) -> "CfgNode":
        out = CfgNode()
        for k, v in self.items():
            if isinstance(v, CfgNode):
                dict.__setitem__(out, k, v.clone())
            else:
                dict.__setitem__(out, k, copy.deepcopy(v))
        return out

    # -- merging -----------------------------------------------------------
    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        _merge_a_into_b(other, self)

    def merge_from_file(self, filename: str, allow_unsafe: bool = False) -> None:
        loaded = _load_yaml_with_base(filename)
        _merge_a_into_b(CfgNode(loaded), self)

    def merge_from_list(self, opts: List[str]) -> None:
        assert len(opts) % 2 == 0, f"Override list has odd length: {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"Non-existent key: {key}")
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Non-existent key: {key}")
            node[leaf] = _decode_and_coerce(value, node[leaf], key)

    # -- serialization -----------------------------------------------------
    def to_dict(self) -> Dict:
        out = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, CfgNode) else v
        return out

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), default_flow_style=False)

    def __str__(self) -> str:
        def _indent(s, n):
            return "\n".join(" " * n + line for line in s.split("\n"))

        lines = []
        for k, v in sorted(self.items()):
            if isinstance(v, CfgNode):
                lines.append(f"{k}:")
                lines.append(_indent(str(v), 2))
            else:
                lines.append(f"{k}: {v}")
        return "\n".join(lines)

    __repr__ = __str__


def _decode_and_coerce(value: str, old: Any, key: str) -> Any:
    """Parse a CLI string and coerce it to the type of the existing value."""
    import ast

    try:
        parsed = ast.literal_eval(value)
    except (ValueError, SyntaxError):
        try:
            parsed = yaml.safe_load(value)
        except yaml.YAMLError:
            parsed = value
    if old is None or parsed is None:
        return parsed
    if isinstance(old, tuple) and isinstance(parsed, list):
        return tuple(parsed)
    if isinstance(old, list) and isinstance(parsed, tuple):
        return list(parsed)
    if isinstance(old, bool):
        if isinstance(parsed, bool):
            return parsed
        raise ValueError(f"Cannot coerce {value!r} to bool for key {key}")
    if isinstance(old, float) and isinstance(parsed, int):
        return float(parsed)
    if type(parsed) is not type(old) and not isinstance(old, CfgNode):
        if isinstance(parsed, str) or isinstance(old, str):
            raise ValueError(
                f"Type mismatch ({type(old).__name__} vs "
                f"{type(parsed).__name__}) for key {key} with value {value!r}"
            )
    return parsed


def _merge_a_into_b(a: CfgNode, b: CfgNode) -> None:
    for k, v_a in a.items():
        if k in b and isinstance(b[k], CfgNode) and isinstance(v_a, (dict, CfgNode)):
            _merge_a_into_b(CfgNode(v_a) if not isinstance(v_a, CfgNode) else v_a, b[k])
        else:
            if isinstance(v_a, (dict, CfgNode)):
                v_a = CfgNode(v_a) if not isinstance(v_a, CfgNode) else v_a.clone()
            elif k in b and b[k] is not None and v_a is not None:
                v_a = _coerce_value(v_a, b[k], k)
            dict.__setitem__(b, k, v_a)


def _coerce_value(new: Any, old: Any, key: str) -> Any:
    if isinstance(new, str) and not isinstance(old, str):
        # yaml leaves python-literal syntax like "(60000, 80000)" as a string;
        # yacs literal-evals it — match that behavior.
        import ast

        try:
            new = ast.literal_eval(new)
        except (ValueError, SyntaxError):
            pass
    if isinstance(old, tuple) and isinstance(new, list):
        return tuple(new)
    if isinstance(old, list) and isinstance(new, tuple):
        return list(new)
    if isinstance(old, float) and isinstance(new, int):
        return float(new)
    return new


def _load_yaml_with_base(filename: str) -> Dict:
    """Load yaml supporting the ``_BASE_`` inheritance key.

    Reference semantics: detectron2/config/config.py:29-77 — the base file is
    loaded first (path relative to the child file unless absolute), then the
    child's keys are merged over it.
    """
    with open(filename, "r") as f:
        try:
            cfg = yaml.safe_load(f)
        except yaml.constructor.ConstructorError:
            # reference yamls may carry python tags like
            # ``!!python/object/apply:eval`` (e.g. Base-RetinaNet.yaml anchor
            # SIZES); the reference loads those with allow_unsafe=True
            # (detectron2/config/config.py:29). Same trust model here: configs
            # are first-party files.
            f.seek(0)
            logger.warning(f"Loading {filename} with unsafe yaml (python tags)")
            cfg = yaml.unsafe_load(f)
    if cfg is None:
        cfg = {}
    if BASE_KEY in cfg:
        base_filename = cfg.pop(BASE_KEY)
        if base_filename.startswith("~"):
            base_filename = os.path.expanduser(base_filename)
        if not os.path.isabs(base_filename):
            base_filename = os.path.join(os.path.dirname(filename), base_filename)
        base = _load_yaml_with_base(base_filename)
        _dict_merge(cfg, base)
        return base
    return cfg


def _dict_merge(src: Dict, dst: Dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _dict_merge(v, dst[k])
        else:
            dst[k] = v


# ---------------------------------------------------------------------------
# configurable decorator
# ---------------------------------------------------------------------------


def configurable(init_func=None, *, from_config=None):
    """Decorate a function or a class ``__init__`` so it can be called with a
    :class:`CfgNode` (routed through ``from_config``) or with explicit
    arguments.  Reference: detectron2/config/config.py:115-244.
    """

    if init_func is not None:
        assert (
            inspect.isfunction(init_func)
            and from_config is None
            and init_func.__name__ == "__init__"
        ), "Incorrect use of @configurable. Check docstring."

        @functools.wraps(init_func)
        def wrapped(self, *args, **kwargs):
            try:
                from_config_func = type(self).from_config
            except AttributeError as e:
                raise AttributeError(
                    "Class with @configurable __init__ must have a from_config classmethod."
                ) from e
            if _called_with_cfg(*args, **kwargs):
                explicit = _get_args_from_config(from_config_func, *args, **kwargs)
                init_func(self, **explicit)
            else:
                init_func(self, *args, **kwargs)

        wrapped.from_config = from_config
        return wrapped

    assert from_config is not None, "from_config must be given for functions"

    def wrapper(orig_func):
        @functools.wraps(orig_func)
        def wrapped(*args, **kwargs):
            if _called_with_cfg(*args, **kwargs):
                explicit = _get_args_from_config(from_config, *args, **kwargs)
                return orig_func(**explicit)
            return orig_func(*args, **kwargs)

        wrapped.from_config = from_config
        return wrapped

    return wrapper


def _called_with_cfg(*args, **kwargs) -> bool:
    if len(args) and isinstance(args[0], CfgNode):
        return True
    if isinstance(kwargs.pop("cfg", None), CfgNode):
        return True
    return False


def _get_args_from_config(from_config_func, *args, **kwargs):
    signature = inspect.signature(from_config_func)
    supports_var_kw = any(
        p.kind == inspect.Parameter.VAR_KEYWORD
        for p in signature.parameters.values()
    )
    if supports_var_kw:
        ret = from_config_func(*args, **kwargs)
    else:
        supported = set(signature.parameters.keys())
        extra = {k: kwargs.pop(k) for k in list(kwargs) if k not in supported}
        ret = from_config_func(*args, **kwargs)
        ret.update(extra)
    return ret
