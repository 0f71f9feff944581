"""Checkpoint save/load/resume for variable pytrees.

Reference: detectron2/checkpoint/detection_checkpoint.py:11
(``DetectionCheckpointer``) + fvcore Checkpointer semantics
(``last_checkpoint`` file, ``resume_or_load``). TPU re-design: checkpoints
are numpy pytrees (pickle), saved by process 0 only; zoo ``.pkl``/``.pth``
files go through the converter in `c2_model_loading`.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from ..utils import comm
from .c2_model_loading import align_and_update_state_dict

logger = logging.getLogger(__name__)


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class DetectionCheckpointer:
    def __init__(self, variables: Dict, save_dir: str = "", **checkpointables: Any):
        self.variables = variables
        self.save_dir = save_dir
        self.checkpointables = dict(checkpointables)

    def save(self, name: str, **kwargs) -> None:
        if not self.save_dir or not comm.is_main_process():
            return
        data: Dict[str, Any] = {"variables": _to_numpy(self.variables)}
        for key, obj in self.checkpointables.items():
            if hasattr(obj, "state_dict"):
                data[key] = obj.state_dict()
            else:
                data[key] = _to_numpy(obj)
        data.update(kwargs)
        os.makedirs(self.save_dir, exist_ok=True)
        basename = f"{name}.ckpt"
        save_file = os.path.join(self.save_dir, basename)
        with open(save_file, "wb") as f:
            pickle.dump(data, f, protocol=4)
        self.tag_last_checkpoint(basename)
        logger.info(f"Saving checkpoint to {save_file}")

    # -- orbax backend (optional, production-grade async/sharded saves) ----
    def save_orbax(self, name: str, **kwargs) -> None:
        """Save with orbax-checkpoint (handles sharded arrays natively;
        preferred for multi-host training)."""
        if not self.save_dir:
            return
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.save_dir, name + ".orbax"))
        ckptr = ocp.StandardCheckpointer()
        payload = {"variables": self.variables}
        payload.update({k: v for k, v in kwargs.items()})
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        self.tag_last_checkpoint(name + ".orbax")
        logger.info(f"Saving orbax checkpoint to {path}")

    def load_orbax(self, path: str) -> Dict:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
        self.variables = restored.pop("variables")
        return restored

    def load(self, path: str, checkpointables: Optional[List[str]] = None) -> Dict:
        if not path:
            logger.info("No checkpoint given; model stays at init.")
            return {}
        logger.info(f"Loading checkpoint from {path}")
        if path.endswith(".pkl") or path.endswith(".pth"):
            # reference-format weights
            self.variables = align_and_update_state_dict(self.variables, path)
            return {}
        if path.endswith(".orbax"):
            return self.load_orbax(path)
        if path.endswith(".ckpt.gz"):
            import gzip

            with gzip.open(path, "rb") as f:
                data = pickle.load(f)
        else:
            with open(path, "rb") as f:
                data = pickle.load(f)
        variables = data.pop("variables")
        # float16 is a storage-only dtype here (committed fixture
        # checkpoints ship f16 to halve their size; compute dtypes are
        # f32/bf16) — upcast on load
        import jax

        self.variables = jax.tree_util.tree_map(
            lambda a: a.astype("float32")
            if hasattr(a, "dtype") and a.dtype == "float16"
            else a,
            variables,
        )
        for key in list(self.checkpointables.keys() if checkpointables is None else checkpointables):
            if key in data:
                obj = self.checkpointables.get(key)
                if obj is not None and hasattr(obj, "load_state_dict"):
                    obj.load_state_dict(data.pop(key))
                else:
                    self.checkpointables[key] = data.pop(key)
        return data

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.save_dir, "last_checkpoint"))

    def get_checkpoint_file(self) -> str:
        save_file = os.path.join(self.save_dir, "last_checkpoint")
        try:
            with open(save_file, "r") as f:
                last_saved = f.read().strip()
        except IOError:
            return ""
        return os.path.join(self.save_dir, last_saved)

    def tag_last_checkpoint(self, last_filename_basename: str) -> None:
        with open(os.path.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(last_filename_basename)

    def resume_or_load(self, path: str, *, resume: bool = True) -> Dict:
        """Reference defaults.py:312 semantics: if resume and a last
        checkpoint exists, load it (with checkpointables); else load ``path``
        (weights only)."""
        if resume and self.has_checkpoint():
            path = self.get_checkpoint_file()
            return self.load(path)
        return self.load(path, checkpointables=[])


class PeriodicCheckpointer:
    """Reference fvcore PeriodicCheckpointer / hooks.py:181."""

    def __init__(self, checkpointer: DetectionCheckpointer, period: int, max_iter: Optional[int] = None):
        self.checkpointer = checkpointer
        self.period = period
        self.max_iter = max_iter

    def step(self, iteration: int, **kwargs) -> None:
        iteration = int(iteration)
        if (iteration + 1) % self.period == 0:
            self.checkpointer.save(f"model_{iteration:07d}", iteration=iteration, **kwargs)
        if self.max_iter is not None and iteration >= self.max_iter - 1:
            self.checkpointer.save("model_final", iteration=iteration, **kwargs)

    def save(self, name: str, **kwargs) -> None:
        self.checkpointer.save(name, **kwargs)
