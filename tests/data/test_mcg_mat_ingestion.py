"""MCG .mat ingestion fixture: scipy-written .mat files in the reference's
layout (tools/proposal_convert.py) round-trip through the converters, the
dataset loader, the geometric proposal transform, and the static batch
collate, with boxes/superpixels/oh_labels intact.

Covers convert_mcg_mat_to_pickle (box mats: (y1,x1,y2,x2) 1-indexed) and
convert_mcg_seg_mat_to_pickle (seg mats: superpixels/labels/scores,
1-based ids; boxes = member-superpixel extents)."""

import numpy as np
import pytest
from scipy.io import savemat

from jtsm_tpu.structures import BoxMode
from jtsm_tpu.wsl.data import (
    add_wsl_batch_fields,
    convert_mcg_mat_to_pickle,
    convert_mcg_seg_mat_to_pickle,
    load_mcg_proposals,
    load_mcg_proposals_into_dataset,
    transform_proposals_seg,
)


def test_box_mat_roundtrip(tmp_path):
    # reference layout: boxes (y1, x1, y2, x2), 1-indexed
    boxes_yx1 = np.asarray([[3, 5, 30, 40], [11, 2, 25, 20]], np.float64)
    scores = np.asarray([[0.9], [0.4]], np.float64)
    savemat(tmp_path / "img7.mat", {"boxes": boxes_yx1, "scores": scores})
    out = str(tmp_path / "props.pkl")
    convert_mcg_mat_to_pickle(str(tmp_path), out, ["img7"])

    p = load_mcg_proposals(out)
    np.testing.assert_allclose(
        p["boxes"][0], [[4, 2, 39, 29], [1, 10, 19, 24]]
    )  # XYXY 0-indexed
    np.testing.assert_allclose(p["objectness_logits"][0], [0.9, 0.4])
    assert p["bbox_mode"] == int(BoxMode.XYXY_ABS)


def _seg_mat(tmp_path, image_id):
    # 8x8 map with 4 quadrant superpixels (ids 1..4, 1-based like MCG)
    sp = np.zeros((8, 8), np.int32)
    sp[:4, 4:] = 1
    sp[4:, :4] = 2
    sp[4:, 4:] = 3
    sp += 1
    # proposal 0 = superpixels {1,2} (top half); proposal 1 = {4} (bottom right)
    labels = np.empty((2, 1), object)
    labels[0, 0] = np.asarray([[1, 2]])
    labels[1, 0] = np.asarray([[4]])
    savemat(
        tmp_path / f"{image_id}.mat",
        {"superpixels": sp, "labels": labels, "scores": np.asarray([[0.8], [0.3]])},
    )
    return sp - 1


def test_seg_mat_roundtrip_through_loader_and_batch(tmp_path):
    sp0 = _seg_mat(tmp_path, "2007_000001")
    out = str(tmp_path / "seg_props.pkl")
    convert_mcg_seg_mat_to_pickle(str(tmp_path), out, ["2007_000001"])

    dicts = [
        {
            "file_name": "x.png",
            "image_id": "2007_000001",
            "height": 8,
            "width": 8,
        }
    ]
    load_mcg_proposals_into_dataset(dicts, out)
    d = dicts[0]
    # extents: proposal 0 covers the full top half; proposal 1 bottom-right
    np.testing.assert_allclose(d["proposal_boxes"], [[0, 0, 7, 3], [4, 4, 7, 7]])
    np.testing.assert_array_equal(d["proposal_superpixels"], sp0)
    assert d["proposal_oh_labels"].tolist() == [
        [True, True, False, False],
        [False, False, False, True],
    ]

    # through the geometric transform (identity) and the static collate
    class _Id:
        def apply_box(self, b):
            return b

        def apply_segmentation(self, s):
            return s

    transform_proposals_seg(
        d, (8, 8), _Id(), proposal_topk=4, max_superpixels=6
    )
    pr = d["proposals"]
    assert pr["boxes"].shape == (2, 4)  # truncation to topk; padding at collate
    assert pr["oh_labels"].shape == (2, 6)
    assert pr["oh_labels"][0].tolist() == [True, True, False, False, False, False]

    batch = {
        "image": np.zeros((1, 8, 8, 3), np.float32),
        "proposals": np.zeros((1, 4, 4), np.float32),
    }
    d["image"] = np.zeros((8, 8, 3), np.uint8)
    add_wsl_batch_fields(batch, [d], max_superpixels=6)
    np.testing.assert_array_equal(batch["superpixels"][0], sp0)
    assert batch["oh_labels"][0, 0].tolist() == [True, True, False, False, False, False]
    assert batch["oh_labels"][0, 1].tolist() == [False, False, False, True, False, False]
