"""VOC2012+SBD converter pipeline (reference convert_voc2012_and_sbd_*.py)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from jtsm_tpu.wsl import voc_sbd


def _fake_voc(root):
    """Two instances (classes 3 and 7) + background + void edge."""
    os.makedirs(os.path.join(root, "SegmentationObject"))
    os.makedirs(os.path.join(root, "SegmentationClass"))
    os.makedirs(os.path.join(root, "JPEGImages"))
    inst = np.zeros((40, 50), np.uint8)
    cls_ = np.zeros((40, 50), np.uint8)
    inst[5:15, 5:20] = 1
    cls_[5:15, 5:20] = 3
    inst[20:35, 25:45] = 2
    cls_[20:35, 25:45] = 7
    inst[0, :] = 255
    cls_[0, :] = 255
    pal = voc_sbd.voc_colormap().reshape(-1).tolist()
    for arr, d in [(inst, "SegmentationObject"), (cls_, "SegmentationClass")]:
        im = Image.fromarray(arr, mode="P")
        im.putpalette(pal)
        im.save(os.path.join(root, d, "img0.png"))
    Image.fromarray(np.zeros((40, 50, 3), np.uint8)).save(
        os.path.join(root, "JPEGImages", "img0.jpg")
    )


def test_instance_and_panoptic_conversion(tmp_path):
    voc = str(tmp_path / "VOC2012")
    out = str(tmp_path / "VOC_SBD")
    _fake_voc(voc)

    j = voc_sbd.convert_split_instance(["img0"], "voc_2012_test", voc, None, out)
    data = json.load(open(j))
    assert len(data["images"]) == 1 and len(data["annotations"]) == 2
    cats = sorted(a["category_id"] for a in data["annotations"])
    assert cats == [3, 7]
    for a in data["annotations"]:
        assert a["segmentation"] and a["area"] > 0
    assert os.path.isfile(os.path.join(out, "images", "img0.jpg"))

    pj = voc_sbd.convert_split_panoptic(["img0"], "voc_2012_test", voc, None, out)
    pdata = json.load(open(pj))
    segs = pdata["annotations"][0]["segments_info"]
    # 2 things + 1 background stuff
    assert len(segs) == 3
    assert sorted(s["category_id"] for s in segs) == [3, 7, voc_sbd.BACKGROUND_CATEGORY_ID]
    png = np.asarray(
        Image.open(os.path.join(out, "annotations", "panoptic", "img0.png"))
    )
    ids = voc_sbd.rgb_to_id(png)
    assert set(np.unique(ids)) == {0} | {s["id"] for s in segs}  # 0 = void edge

    voc_sbd.separate_semantic_from_panoptic(
        pj,
        os.path.join(out, "annotations", "panoptic"),
        os.path.join(out, "annotations", "panoptic_stuff"),
    )
    sem = np.asarray(
        Image.open(os.path.join(out, "annotations", "panoptic_stuff", "img0.png"))
    )
    assert set(np.unique(sem)) <= {0, 1, 255}  # things -> 0, background stuff -> 1
    assert (sem == 1).sum() > 0 and (sem == 0).sum() > 0 and (sem[0] == 255).all()


def test_wsl_builtin_registration():
    from jtsm_tpu.data.catalog import DatasetCatalog, MetadataCatalog

    import jtsm_tpu.wsl  # noqa: F401  (import triggers registration)

    for name in [
        "voc_2012_train_instance",
        "sbd_9118_instance",
        "voc_2012_train_panoptic_separated",
        "voc_2007_train_pgt",
        "flickr_voc",
    ]:
        assert name in DatasetCatalog.list(), name
    meta = MetadataCatalog.get("voc_2012_train_panoptic_separated")
    assert meta.stuff_classes[0] == "things" and len(meta.thing_classes) == 20
