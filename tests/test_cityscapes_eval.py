"""Cityscapes evaluation protocol tests with hand-checkable numbers.

Instance: real mask AP (segm-mode COCOEval over pasted RLE masks) — not box
AP mislabeled as segm (reference cityscapes_evaluation.py:96-108).
SemSeg: official label-mapped pixel protocol vs *_gtFine_labelIds.png, with
instance-weighted iIoU from *_gtFine_instanceIds.png (reference
cityscapes_evaluation.py:140-172).
"""

import os

import numpy as np
import pytest
from PIL import Image

from jtsm_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from jtsm_tpu.evaluation.cityscapes_evaluation import (
    CityscapesInstanceEvaluator,
    CityscapesSemSegEvaluator,
)
from jtsm_tpu.structures import BoxMode


@pytest.fixture()
def toy_instance_dataset():
    name = "toy_cityscapes_instances"

    def load():
        # one 100x100 image with two square instances
        sq = lambda x0, y0, x1, y1: [
            [x0, y0, x1, y0, x1, y1, x0, y1]
        ]  # clockwise polygon
        return [
            {
                "file_name": "img0.png",
                "image_id": "img0",
                "height": 100,
                "width": 100,
                "annotations": [
                    {
                        "category_id": 0,
                        "bbox": [10, 10, 50, 50],
                        "bbox_mode": BoxMode.XYXY_ABS,
                        "segmentation": sq(10, 10, 50, 50),
                        "iscrowd": 0,
                    },
                    {
                        "category_id": 1,
                        "bbox": [60, 60, 90, 90],
                        "bbox_mode": BoxMode.XYXY_ABS,
                        "segmentation": sq(60, 60, 90, 90),
                        "iscrowd": 0,
                    },
                ],
            }
        ]

    if name not in DatasetCatalog:
        DatasetCatalog.register(name, load)
        MetadataCatalog.get(name).set(
            thing_classes=["person", "car"], evaluator_type="cityscapes_instance"
        )
    return name


def test_cityscapes_instance_mask_ap(toy_instance_dataset):
    ev = CityscapesInstanceEvaluator(toy_instance_dataset)
    ev.reset()
    # predictions: class 0 exactly right (full mask in the right box);
    # class 1 box correct but mask only covers the left 3/4 of the box
    # -> mask IoU ~0.75, so it matches at thresholds 0.5-0.7 only
    full = np.ones((28, 28), np.float32)
    half = np.zeros((28, 28), np.float32)
    half[:, :21] = 1.0
    outputs = {
        "boxes": np.asarray([[[10, 10, 50, 50], [60, 60, 90, 90]]], np.float32),
        "scores": np.asarray([[0.9, 0.8]], np.float32),
        "classes": np.asarray([[0, 1]], np.int32),
        "valid": np.asarray([[True, True]]),
        "masks": np.stack([np.stack([full, half])]),
    }
    inputs = {
        "image_ids": ["img0"],
        "orig_sizes": np.asarray([[100, 100]]),
    }
    ev.process(inputs, outputs)
    res = ev.evaluate()
    # class 0: IoU ~= 1 -> AP 100 at every threshold; class 1 matches at
    # the low thresholds only. mean AP must sit strictly between.
    assert res["segm"]["AP50"] == pytest.approx(100.0, abs=1e-6)
    # class0 AP = 100 (all 10 thresholds); class1 matches ~5/10 thresholds
    assert 65.0 < res["segm"]["AP"] < 85.0


def _write_png(path, arr):
    Image.fromarray(arr.astype(np.int32), mode="I").save(path)


@pytest.fixture()
def toy_semseg_dataset(tmp_path):
    name = "toy_cityscapes_semseg"
    # 20x20: top 10 rows road (id 7); bottom 10 rows car (id 26) except a
    # 20x2 void strip (id 0) at rows 8-9
    gt = np.full((20, 20), 26, np.int32)
    gt[:10] = 7
    gt[8:10, :] = 0
    inst = gt * 1000  # instance encoding labelId*1000+k for instance classes
    inst[gt == 7] = 7
    inst[gt == 0] = 0
    # two car instances: left 16 cols inst 0, right 4 cols inst 1
    inst[10:, :16] = 26000
    inst[10:, 16:] = 26001
    gt_file = str(tmp_path / "x_gtFine_labelIds.png")
    _write_png(gt_file, gt)
    _write_png(str(tmp_path / "x_gtFine_instanceIds.png"), inst)

    def load():
        return [
            {"file_name": "x.png", "image_id": 0, "sem_seg_file_name": gt_file}
        ]

    # unique name per tmp_path
    name = f"toy_cityscapes_semseg_{abs(hash(str(tmp_path))) % 10**8}"
    DatasetCatalog.register(name, load)
    MetadataCatalog.get(name).set(
        stuff_classes=["road", "car"], evaluator_type="cityscapes_sem_seg"
    )
    return name


def test_cityscapes_semseg_protocol(toy_semseg_dataset):
    ev = CityscapesSemSegEvaluator(toy_semseg_dataset)
    ev.reset()
    # prediction in trainId space: road trainId 0, car trainId 13.
    # correct everywhere except the car instance's rightmost 4 columns
    # (inst 26001, 40 px) predicted as road.
    pred = np.full((20, 20), 13, np.int64)
    pred[:10] = 0
    pred[10:, 16:] = 0  # the small car instance entirely mispredicted
    # the void strip rows 8-9 are road in the prediction (gt void: ignored)
    inputs = {"image_ids": np.asarray([0])}
    ev.process(inputs, {"sem_seg": pred[None]})
    res = ev.evaluate()["sem_seg"]

    # hand-computed: road gt = rows 0..7 (160 px, rows 8-9 are void) all
    # predicted road -> tp=160. road fp = 40 car px predicted road (void px
    # never count as fp). road IoU = 160/200 = 0.8.
    # car gt = 200 px, tp=160, fn=40, fp=0 -> IoU = 160/200 = 0.8.
    assert res["IoU-road"] == pytest.approx(80.0, abs=1e-4)
    assert res["IoU-car"] == pytest.approx(80.0, abs=1e-4)
    assert res["IoU"] == pytest.approx(80.0, abs=1e-4)

    # iIoU (car only): avg inst size = (160+40)/2 = 100.
    # inst A: w=100/160, tp=160 -> wtp=100, wfn=0
    # inst B: w=100/40, tp=0 -> wtp=0, wfn=100
    # fp (plain pixels) = 0 -> iIoU = 100/(100+100) = 0.5
    assert res["iIoU"] == pytest.approx(50.0, abs=1e-4)
    # categories: road->flat IoU 0.8; car->vehicle IoU 0.8
    assert res["IoU_sup"] == pytest.approx(80.0, abs=1e-4)
    assert res["iIoU_sup"] == pytest.approx(50.0, abs=1e-4)
