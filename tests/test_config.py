import os
import tempfile

import pytest

from jtsm_tpu.config import CfgNode, configurable, get_cfg


def test_defaults_clone_independent():
    c1 = get_cfg()
    c2 = get_cfg()
    c1.MODEL.META_ARCHITECTURE = "X"
    assert c2.MODEL.META_ARCHITECTURE == "GeneralizedRCNN"


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.MASK_ON = True
    cfg.defrost()
    cfg.MODEL.MASK_ON = True
    assert cfg.MODEL.MASK_ON


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(["MODEL.MASK_ON", "True", "SOLVER.BASE_LR", "0.02"])
    assert cfg.MODEL.MASK_ON is True
    assert cfg.SOLVER.BASE_LR == 0.02


def test_merge_from_list_type_coercion():
    cfg = get_cfg()
    cfg.merge_from_list(["SOLVER.STEPS", "(10, 20)"])
    assert cfg.SOLVER.STEPS == (10, 20)
    cfg.merge_from_list(["SOLVER.BASE_LR", "1"])
    assert cfg.SOLVER.BASE_LR == 1.0
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NO.SUCH.KEY", "1"])


def test_merge_from_file_with_base():
    with tempfile.TemporaryDirectory() as d:
        base = os.path.join(d, "base.yaml")
        child = os.path.join(d, "child.yaml")
        with open(base, "w") as f:
            f.write("MODEL:\n  MASK_ON: true\n  RESNETS:\n    DEPTH: 101\n")
        with open(child, "w") as f:
            f.write(f"_BASE_: base.yaml\nMODEL:\n  RESNETS:\n    DEPTH: 18\n")
        cfg = get_cfg()
        cfg.merge_from_file(child)
        assert cfg.MODEL.MASK_ON is True
        assert cfg.MODEL.RESNETS.DEPTH == 18


def test_dump_roundtrip():
    cfg = get_cfg()
    import yaml

    d = yaml.safe_load(cfg.dump())
    assert d["MODEL"]["META_ARCHITECTURE"] == "GeneralizedRCNN"


def test_configurable():
    class A:
        @configurable
        def __init__(self, x, y=2):
            self.x = x
            self.y = y

        @classmethod
        def from_config(cls, cfg):
            return {"x": cfg.SOLVER.BASE_LR}

    cfg = get_cfg()
    a1 = A(cfg)
    assert a1.x == cfg.SOLVER.BASE_LR and a1.y == 2
    a2 = A(5, y=7)
    assert a2.x == 5 and a2.y == 7
