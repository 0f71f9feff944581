"""Picklable wrapper for lambdas/closures (reference: detectron2/utils/
serialize.py ``PicklableWrapper`` via cloudpickle)."""

from __future__ import annotations

import pickle


class PicklableWrapper:
    """Wrap an object so it is picklable even if it's a lambda/closure, by
    serializing with cloudpickle when available (plain pickle otherwise)."""

    def __init__(self, obj):
        self._obj = obj

    def __reduce__(self):
        try:
            import cloudpickle

            s = cloudpickle.dumps(self._obj)
        except ImportError:
            s = pickle.dumps(self._obj)
        return _unpickle, (s,)

    def __call__(self, *args, **kwargs):
        return self._obj(*args, **kwargs)

    def __getattr__(self, attr):
        if attr not in ["_obj"]:
            return getattr(self._obj, attr)
        return getattr(self, attr)


def _unpickle(s):
    try:
        import cloudpickle

        return PicklableWrapper(cloudpickle.loads(s))
    except ImportError:
        return PicklableWrapper(pickle.loads(s))
