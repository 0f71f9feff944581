"""COCOProposalEvaluator: COCO-style proposal AR (averaged over IoU
thresholds 0.5:0.05:0.95; reference coco_evaluation.py
_evaluate_box_proposals)."""

import json

import numpy as np

from jtsm_tpu.data import MetadataCatalog
from jtsm_tpu.evaluation import COCOProposalEvaluator


def test_proposal_ar(tmp_path):
    gt = {
        "images": [{"id": 1, "width": 40, "height": 40, "file_name": "x.jpg"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "bbox": [0, 0, 10, 10], "area": 100},
            {"id": 2, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "bbox": [20, 20, 10, 10], "area": 100},
        ],
        "categories": [{"id": 1, "name": "thing"}],
    }
    jf = tmp_path / "gt.json"
    jf.write_text(json.dumps(gt))
    name = "proposal_eval_test_ds"
    MetadataCatalog.get(name).json_file = str(jf)

    ev = COCOProposalEvaluator(name, limits=(100,))
    ev.reset()
    # proposal 0 matches GT1 exactly (IoU 1.0); proposal 1 overlaps GT2 at
    # IoU 0.84 (inter 84, union 100) — strictly between thresholds so fp
    # boundary jitter cannot flip the count
    outputs = {
        "proposals": np.asarray(
            [[[0, 0, 10, 10], [20, 20, 30, 28.4], [0, 0, 1, 1]]], np.float32
        ),
        "scores": np.asarray([[3.0, 2.0, 1.0]], np.float32),
    }
    inputs = {"image_ids": np.asarray([1])}
    ev.process(inputs, outputs)
    res = ev.evaluate()["box_proposals"]
    # GT1 best IoU 1.0 -> recalled at all 10 thresholds; GT2 best IoU 0.84
    # -> recalled at 0.50..0.80 (7 of 10). AR = (10 + 7) / 20 = 85%.
    np.testing.assert_allclose(res["AR@100"], 85.0)


def test_proposal_ar_greedy_one_to_one(tmp_path):
    """A single proposal overlapping two GTs may satisfy only ONE of them
    (reference _evaluate_box_proposals consumes the proposal after matching:
    overlaps[box_ind, :] = -1)."""
    gt = {
        "images": [{"id": 1, "width": 40, "height": 40, "file_name": "x.jpg"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "bbox": [0, 0, 10, 10], "area": 100},
            {"id": 2, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "bbox": [8, 0, 10, 10], "area": 100},
        ],
        "categories": [{"id": 1, "name": "thing"}],
    }
    jf = tmp_path / "gt.json"
    jf.write_text(json.dumps(gt))
    name = "proposal_eval_greedy_ds"
    MetadataCatalog.get(name).json_file = str(jf)

    ev = COCOProposalEvaluator(name, limits=(100,))
    ev.reset()
    # one proposal covering both GT boxes: IoU to GT1 = 10*10/(10*10+18*10-100)
    # = 100/180 ~ 0.556 each... use a proposal equal to GT1 (IoU 1.0 to GT1,
    # 2/18 to GT2): GT2 must stay unmatched.
    outputs = {
        "proposals": np.asarray([[[0, 0, 10, 10]]], np.float32),
        "scores": np.asarray([[3.0]], np.float32),
    }
    ev.process({"image_ids": np.asarray([1])}, outputs)
    res = ev.evaluate()["box_proposals"]
    # GT1 recalled at all thresholds, GT2 at none -> AR = 10/20 = 50%
    np.testing.assert_allclose(res["AR@100"], 50.0)
