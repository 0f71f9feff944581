"""Bridge to the source-tree research projects (reference:
detectron2/projects/__init__.py:16 installs a MetaPathFinder so
``detectron2.projects.point_rend`` imports from the repo's projects/ dir).

Here the same contract: ``from jtsm_tpu.projects import point_rend`` (or
deeplab / panoptic_deeplab / densepose / tensormask / tridentnet / wsl)
resolves to the package under <repo>/projects/.
"""

from __future__ import annotations

import importlib.abc
import importlib.util
import os
import sys

_PROJECTS = {
    "point_rend": "PointRend",
    "deeplab": "DeepLab",
    "panoptic_deeplab": "Panoptic-DeepLab",
    "densepose": "DensePose",
    "tensormask": "TensorMask",
    "tridentnet": "TridentNet",
}

_PROJECT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "projects",
)


class _ProjectsFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, name, path, target=None):
        if not name.startswith(__name__ + "."):
            return None
        project = name[len(__name__) + 1 :].split(".")[0]
        if project not in _PROJECTS:
            return None
        proj_dir = os.path.join(_PROJECT_ROOT, _PROJECTS[project])
        if proj_dir not in sys.path:
            sys.path.insert(0, proj_dir)
        # import the real package and alias it under jtsm_tpu.projects.*
        tail = name[len(__name__) + 1 :]
        real = importlib.import_module(tail)
        sys.modules[name] = real
        return importlib.util.spec_from_loader(name, loader=None)


_finder = _ProjectsFinder()
if not any(isinstance(f, _ProjectsFinder) for f in sys.meta_path):
    sys.meta_path.append(_finder)
