"""Dataset & metadata catalogs (reference: detectron2/data/catalog.py:13
``DatasetCatalog``, :91 ``Metadata``, :181 ``MetadataCatalog``)."""

from __future__ import annotations

import copy
import types
from typing import Callable, Dict, List


class _DatasetCatalog:
    def __init__(self):
        self._registry: Dict[str, Callable] = {}

    def register(self, name: str, func: Callable) -> None:
        assert callable(func), "You must register a function with DatasetCatalog.register!"
        assert name not in self._registry, f"Dataset '{name}' is already registered!"
        self._registry[name] = func

    def get(self, name: str) -> List[dict]:
        try:
            f = self._registry[name]
        except KeyError as e:
            raise KeyError(
                f"Dataset '{name}' is not registered! Available: "
                f"{', '.join(sorted(self._registry))}"
            ) from e
        return f()

    def list(self) -> List[str]:
        return sorted(self._registry.keys())

    def remove(self, name: str) -> None:
        self._registry.pop(name)

    def clear(self) -> None:
        self._registry.clear()

    def __contains__(self, name: str) -> bool:
        return name in self._registry


DatasetCatalog = _DatasetCatalog()


class Metadata(types.SimpleNamespace):
    """Attribute namespace with write-once semantics (reference catalog.py:91)."""

    name: str = "N/A"

    _RENAMED = {
        "class_names": "thing_classes",
        "dataset_id_to_contiguous_id": "thing_dataset_id_to_contiguous_id",
        "stuff_class_names": "stuff_classes",
    }

    def __getattr__(self, key):
        if key in self._RENAMED:
            return getattr(self, self._RENAMED[key])
        raise AttributeError(
            f"Attribute '{key}' does not exist in the metadata of dataset "
            f"'{self.name}': metadata is empty."
            if len(self.__dict__) <= 1
            else f"Attribute '{key}' does not exist in the metadata of dataset "
            f"'{self.name}'. Available keys are {sorted(self.__dict__.keys())}."
        )

    def __setattr__(self, key, val):
        if key in self._RENAMED:
            key = self._RENAMED[key]
        try:
            oldval = getattr(self, key)
            assert oldval == val, (
                f"Attribute '{key}' in the metadata of '{self.name}' cannot be "
                f"set to a different value!\n{oldval} != {val}"
            )
        except AttributeError:
            super().__setattr__(key, val)

    def as_dict(self) -> Dict:
        return copy.copy(self.__dict__)

    def set(self, **kwargs) -> "Metadata":
        for k, v in kwargs.items():
            setattr(self, k, v)
        return self

    def get(self, key, default=None):
        try:
            return getattr(self, key)
        except AttributeError:
            return default


class _MetadataCatalog:
    def __init__(self):
        self._registry: Dict[str, Metadata] = {}

    def get(self, name: str) -> Metadata:
        assert len(name)
        if name not in self._registry:
            self._registry[name] = Metadata(name=name)
        return self._registry[name]

    def list(self) -> List[str]:
        return sorted(self._registry.keys())

    def remove(self, name: str) -> None:
        self._registry.pop(name)

    def clear(self) -> None:
        self._registry.clear()

    def __contains__(self, name: str) -> bool:
        return name in self._registry


MetadataCatalog = _MetadataCatalog()
