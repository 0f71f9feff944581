"""PathManager-lite (reference: detectron2/utils/file_io.py registers
``detectron2://`` / ``catalog://`` handlers on fvcore's PathManager).

Supports local paths, ``detectron2://`` (reference zoo, resolved to the
public URL and cached under ~/.cache/jtsm_tpu if the environment has
network), and http(s) URLs."""

from __future__ import annotations

import logging
import os
import shutil
import urllib.request
from typing import Optional

logger = logging.getLogger(__name__)

_D2_PREFIX = "detectron2://"
_D2_BASE = "https://dl.fbaipublicfiles.com/detectron2/"
_CACHE = os.path.expanduser(os.environ.get("JTSM_CACHE", "~/.cache/jtsm_tpu"))


class PathManager:
    @staticmethod
    def get_local_path(path: str) -> str:
        if path.startswith("catalog://"):
            from ..checkpoint.catalog import ModelCatalog

            path = ModelCatalog.get(path)
        if path.startswith(_D2_PREFIX):
            path = _D2_BASE + path[len(_D2_PREFIX) :]
        if path.startswith(("http://", "https://")):
            os.makedirs(_CACHE, exist_ok=True)
            local = os.path.join(_CACHE, path.split("/")[-1])
            if not os.path.exists(local):
                logger.info(f"Downloading {path} -> {local}")
                try:
                    with urllib.request.urlopen(path) as r, open(local, "wb") as f:
                        shutil.copyfileobj(r, f)
                except Exception as e:
                    raise OSError(
                        f"Could not fetch {path} (offline environment?): {e}"
                    ) from e
            return local
        return path

    @staticmethod
    def exists(path: str) -> bool:
        if path.startswith((_D2_PREFIX, "catalog://", "http://", "https://")):
            return True  # optimistic; resolved at open time
        return os.path.exists(path)

    @staticmethod
    def open(path: str, mode: str = "r", **kwargs):
        return open(PathManager.get_local_path(path), mode, **kwargs)

    @staticmethod
    def mkdirs(path: str) -> None:
        os.makedirs(path, exist_ok=True)
