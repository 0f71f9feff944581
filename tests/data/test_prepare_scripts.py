"""Tests for the datasets/ preparation scripts (reference counterparts:
datasets/prepare_panoptic_fpn.py, prepare_ade20k_sem_seg.py,
prepare_cocofied_lvis.py)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load(name):
    path = os.path.join(REPO, "datasets", name + ".py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_panoptic_to_semantic(tmp_path):
    mod = _load("prepare_panoptic_fpn")
    from jtsm_tpu.evaluation.panoptic_evaluation import id2rgb

    categories = [
        {"id": 1, "isthing": 1},
        {"id": 7, "isthing": 1},
        {"id": 92, "isthing": 0},
        {"id": 93, "isthing": 0},
    ]
    # panoptic PNG: segment 5 = thing(cat 7), segment 9 = stuff(cat 93), 0 = unlabeled
    pan = np.zeros((4, 6), np.uint32)
    pan[:2] = 5
    pan[2:, :3] = 9
    pan_root = tmp_path / "pan"
    sem_root = tmp_path / "sem"
    pan_root.mkdir()
    Image.fromarray(id2rgb(pan).astype(np.uint8)).save(pan_root / "000001.png")
    pj = tmp_path / "panoptic.json"
    pj.write_text(
        json.dumps(
            {
                "annotations": [
                    {
                        "file_name": "000001.png",
                        "segments_info": [
                            {"id": 5, "category_id": 7},
                            {"id": 9, "category_id": 93},
                        ],
                    }
                ]
            }
        )
    )
    mod.separate_semantic_from_panoptic(str(pj), str(pan_root), str(sem_root), categories)
    sem = np.asarray(Image.open(sem_root / "000001.png"))
    assert sem.dtype == np.uint8
    assert (sem[:2] == 0).all()  # thing -> 0
    assert (sem[2:, :3] == 2).all()  # cat 93 is the 2nd stuff id -> contiguous 2
    assert (sem[2:, 3:] == 255).all()  # unlabeled -> ignore


def test_ade20k_shift(tmp_path):
    mod = _load("prepare_ade20k_sem_seg")
    src = tmp_path / "ann"
    dst = tmp_path / "out"
    src.mkdir()
    lab = np.array([[0, 1], [2, 150]], np.uint8)
    Image.fromarray(lab).save(src / "a.png")
    mod.convert_dir(str(src), str(dst))
    out = np.asarray(Image.open(dst / "a.png"))
    assert out.tolist() == [[255, 0], [1, 149]]


def test_cocofy_lvis(tmp_path):
    mod = _load("prepare_cocofied_lvis")
    lvis = {
        "images": [
            {"id": 1, "not_exhaustive_category_ids": [2], "neg_category_ids": [3]},
            {"id": 2, "not_exhaustive_category_ids": [], "neg_category_ids": [1]},
        ],
        "categories": [
            {"id": 1, "synset": "person.n.01", "name": "person"},
            {"id": 2, "synset": "zebra.n.01", "name": "zebra"},
            {"id": 3, "synset": "aerosol.n.02", "name": "aerosol_can"},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 1, "bbox": [0, 0, 5, 5]},
            {"id": 11, "image_id": 1, "category_id": 3, "bbox": [1, 1, 2, 2]},
            {"id": 12, "image_id": 2, "category_id": 2, "bbox": [2, 2, 3, 3]},
        ],
    }
    src = tmp_path / "tiny.json"
    dst = tmp_path / "tiny_cocofied.json"
    src.write_text(json.dumps(lvis))
    mod.cocofy_lvis(str(src), str(dst))
    out = json.loads(dst.read_text())
    # aerosol (no COCO synset) dropped; person->1, zebra->24; ids renumbered
    assert [a["category_id"] for a in out["annotations"]] == [1, 24]
    assert [a["id"] for a in out["annotations"]] == [1, 2]
    assert out["images"][0]["not_exhaustive_category_ids"] == [24]
    assert out["images"][0]["neg_category_ids"] == []
    assert sorted(c["id"] for c in out["categories"]) == [1, 24]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
