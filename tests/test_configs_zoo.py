"""Every zoo config must load through CfgNode and build a model
(mirrors reference tests/test_model_zoo.py)."""

import glob
import os

import pytest

from jtsm_tpu.config import get_cfg
from jtsm_tpu.modeling import build_model

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = sorted(
    os.path.relpath(p, ROOT)
    for p in glob.glob(os.path.join(ROOT, "**", "*.yaml"), recursive=True)
)


def test_config_count():
    # the reference zoo ships 92 configs; ours mirrors it 1:1
    assert len(CONFIGS) >= 92


@pytest.mark.parametrize("rel", [c for c in CONFIGS if "Base-" not in c])
def test_config_builds(rel):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(ROOT, rel))
    model = build_model(cfg)
    assert model is not None
