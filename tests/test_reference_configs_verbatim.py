"""Verbatim reference-config sweep: every yaml shipped by the REFERENCE
(/root/reference/configs and each project's configs) must merge through THIS
repo's ``get_cfg()`` (+ the matching ``add_*_config``) and build a model.

This pins against drift in the repo's mirrored copies: the files parsed here
are the reference's own, untouched. Skipped when /root/reference is absent.

Skip-list (documented): entries that are broken in the UPSTREAM checkout
itself or that exercise an explicitly out-of-scope path.
"""

import glob
import os
import sys

import pytest

from jtsm_tpu.config import get_cfg
from jtsm_tpu.modeling import build_model

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "configs")), reason="reference tree absent"
)

# upstream-broken or out-of-scope reference yamls
SKIP = {
    # references wsl.modeling backbone names that don't exist in the upstream
    # WSL checkout either (documented in jtsm_tpu/wsl/backbones as the
    # upstream-broken aliases); these two yamls ALSO point MODEL.META_ARCHITECTURE
    # at classes upstream deleted:
}

_PROJECT_ADDERS = {}


def _project_sys_path():
    root = os.path.join(os.path.dirname(__file__), "..", "projects")
    for p in (
        "PointRend",
        "TensorMask",
        "DeepLab",
        "Panoptic-DeepLab",
        "TridentNet",
        "DensePose",
    ):
        d = os.path.join(root, p)
        if d not in sys.path:
            sys.path.insert(0, d)


def _adders_for(path: str):
    """The add_*_config chain a reference yaml needs, keyed by which project
    tree it lives in."""
    _project_sys_path()
    out = []
    if "/projects/WSL/" in path:
        import jtsm_tpu.wsl  # noqa: F401 — registers WSL heads/archs

        from jtsm_tpu.wsl.config import add_wsl_config

        out.append(add_wsl_config)
    if "/projects/PointRend/" in path:
        from point_rend import add_pointrend_config

        out.append(add_pointrend_config)
    if "/projects/TensorMask/" in path:
        import tensormask.arch  # noqa: F401 — registers the TensorMask arch
        from tensormask import add_tensormask_config

        out.append(add_tensormask_config)
    if "/projects/DeepLab/" in path or "/projects/Panoptic-DeepLab/" in path:
        from deeplab import add_deeplab_config

        out.append(add_deeplab_config)
    if "/projects/Panoptic-DeepLab/" in path:
        from panoptic_deeplab import add_panoptic_deeplab_config

        out.append(add_panoptic_deeplab_config)
    if "/projects/TridentNet/" in path:
        from tridentnet import add_tridentnet_config

        out.append(add_tridentnet_config)
    if "/projects/DensePose/" in path:
        from densepose import add_densepose_config, add_hrnet_config

        out.append(add_densepose_config)
        out.append(add_hrnet_config)
    return out


def _collect():
    pats = [os.path.join(REF, "configs", "**", "*.yaml")]
    for p in (
        "WSL",
        "DensePose",
        "PointRend",
        "DeepLab",
        "Panoptic-DeepLab",
        "TensorMask",
        "TridentNet",
    ):
        pats.append(os.path.join(REF, "projects", p, "configs", "**", "*.yaml"))
    files = []
    for pat in pats:
        files.extend(glob.glob(pat, recursive=True))
    return sorted(
        f
        for f in files
        if "Base" not in os.path.basename(f) and os.path.relpath(f, REF) not in SKIP
    )


ALL = _collect() if os.path.isdir(os.path.join(REF, "configs")) else []


def test_sweep_covers_reference_zoo():
    assert len(ALL) >= 180  # 92 core + ~140 project yamls minus bases


@pytest.mark.parametrize(
    "path", ALL, ids=[os.path.relpath(p, REF) for p in ALL]
)
def test_reference_config_builds(path):
    cfg = get_cfg()
    for add in _adders_for(path):
        add(cfg)
    cfg.merge_from_file(path)
    model = build_model(cfg)
    assert model is not None
