"""Instances: per-image field container, registered as a JAX pytree.

Reference: detectron2/structures/instances.py:7. TPU re-design: the container
is a pytree whose leaves are fixed-capacity arrays; a conventional boolean
``valid`` field (when present) marks real rows inside the padded capacity so
the whole structure flows through jit with static shapes (SURVEY.md §7
"fixed-capacity pytrees").
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class Instances:
    def __init__(self, image_size: Tuple[int, int], **kwargs: Any):
        self._image_size = tuple(int(x) for x in image_size)
        self._fields: Dict[str, Any] = {}
        for k, v in kwargs.items():
            self.set(k, v)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        names = sorted(self._fields.keys())
        return tuple(self._fields[n] for n in names), (self._image_size, tuple(names))

    @classmethod
    def tree_unflatten(cls, aux, children):
        image_size, names = aux
        obj = object.__new__(cls)
        obj._image_size = image_size
        obj._fields = dict(zip(names, children))
        return obj

    # -- API parity --------------------------------------------------------
    @property
    def image_size(self) -> Tuple[int, int]:
        return self._image_size

    def __setattr__(self, name: str, val: Any) -> None:
        if name.startswith("_"):
            super().__setattr__(name, val)
        else:
            self.set(name, val)

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_") or name not in self._fields:
            raise AttributeError(f"Cannot find field '{name}' in the given Instances!")
        return self._fields[name]

    def set(self, name: str, value: Any) -> None:
        data_len = _length_of(value)
        if len(self._fields) and data_len is not None:
            existing = len(self)
            if existing is not None and data_len != existing:
                raise AssertionError(
                    f"Adding a field of length {data_len} to a Instances of length {existing}"
                )
        self._fields[name] = value

    def has(self, name: str) -> bool:
        return name in self._fields

    def remove(self, name: str) -> None:
        del self._fields[name]

    def get(self, name: str) -> Any:
        return self._fields[name]

    def get_fields(self) -> Dict[str, Any]:
        return self._fields

    def to(self, *args, **kwargs) -> "Instances":
        return self  # device placement managed by jax; kept for parity

    def numpy(self) -> "Instances":
        ret = Instances(self._image_size)
        for k, v in self._fields.items():
            ret.set(k, np.asarray(v) if isinstance(v, jax.Array) else v)
        return ret

    def __getitem__(self, item: Union[int, slice, Any]) -> "Instances":
        if isinstance(item, int):
            if item >= len(self) or item < -len(self):
                raise IndexError("Instances index out of range!")
            item = slice(item, None, len(self))
        ret = Instances(self._image_size)
        for k, v in self._fields.items():
            if hasattr(v, "__getitem__"):
                ret.set(k, v[item])
            else:
                ret.set(k, v)
        return ret

    def __len__(self) -> int:
        for v in self._fields.values():
            n = _length_of(v)
            if n is not None:
                return n
        raise NotImplementedError("Empty Instances does not support __len__!")

    def __iter__(self):
        raise NotImplementedError("`Instances` object is not iterable!")

    @staticmethod
    def cat(instance_lists: List["Instances"]) -> "Instances":
        assert all(isinstance(i, Instances) for i in instance_lists)
        assert len(instance_lists) > 0
        if len(instance_lists) == 1:
            return instance_lists[0]
        image_size = instance_lists[0].image_size
        for i in instance_lists[1:]:
            assert i.image_size == image_size
        ret = Instances(image_size)
        for k in instance_lists[0]._fields.keys():
            values = [i.get(k) for i in instance_lists]
            v0 = values[0]
            if isinstance(v0, (jax.Array, np.ndarray)):
                xp = jnp if isinstance(v0, jax.Array) else np
                ret.set(k, xp.concatenate(values, axis=0))
            elif isinstance(v0, list):
                ret.set(k, sum(values, []))
            elif hasattr(type(v0), "cat"):
                ret.set(k, type(v0).cat(values))
            else:
                raise ValueError(f"Unsupported type {type(v0)} for concatenation")
        return ret

    def __str__(self) -> str:
        s = f"{self.__class__.__name__}("
        try:
            s += f"num_instances={len(self)}, "
        except NotImplementedError:
            s += "num_instances=?, "
        s += f"image_height={self._image_size[0]}, "
        s += f"image_width={self._image_size[1]}, "
        s += f"fields=[{', '.join(f'{k}: {_short(v)}' for k, v in self._fields.items())}])"
        return s

    __repr__ = __str__


def _length_of(value: Any):
    if isinstance(value, (jax.Array, np.ndarray)):
        return value.shape[0] if value.ndim > 0 else None
    if isinstance(value, (list, tuple)):
        return len(value)
    if hasattr(value, "__len__"):
        try:
            return len(value)
        except TypeError:
            return None
    return None


def _short(v: Any) -> str:
    if isinstance(v, (jax.Array, np.ndarray)):
        return f"{type(v).__name__}(shape={tuple(v.shape)}, dtype={v.dtype})"
    return type(v).__name__
