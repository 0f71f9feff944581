"""Disk-driven WSL superpixel loader pipeline: MCG-style pickle (boxes +
superpixel label maps + one-hot membership) -> load_mcg_proposals_into_dataset
-> WSLDatasetMapper (transform_proposals_seg) -> WSLStaticBatchLoader collate
(`superpixels`/`oh_labels` batch fields).

Reference: projects/WSL/wsl/data/build.py SP loaders +
wsl/data/detection_utils.py:266-343.
"""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from jtsm_tpu.config import get_cfg
from jtsm_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from jtsm_tpu.wsl import add_wsl_config
from jtsm_tpu.wsl.data import build_wsl_test_loader, build_wsl_train_loader

H = W = 64
N_IMAGES = 2
R_PKL = 12  # proposals stored in the pickle
TOPK = 8  # static proposal capacity
S = 32  # static superpixel capacity


def _make_dataset(tmp_path, name):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.RandomState(7)
    dicts = []
    ids, boxes_l, logits_l, sp_l, oh_l = [], [], [], [], []
    for i in range(N_IMAGES):
        fname = str(img_dir / f"{i}.png")
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(fname)
        dicts.append(
            {
                "file_name": fname,
                "image_id": i,
                "height": H,
                "width": W,
                "annotations": [
                    {
                        "category_id": 0,
                        "bbox": [8.0, 8.0, 24.0, 24.0],
                        "bbox_mode": 0,
                        "iscrowd": 0,
                    }
                ],
            }
        )
        x1 = rng.rand(R_PKL) * 30
        y1 = rng.rand(R_PKL) * 30
        boxes = np.stack([x1, y1, x1 + 16, y1 + 16], 1).astype(np.float32)
        # descending logits => pickle order IS the topk order
        logits = np.linspace(5.0, 1.0, R_PKL).astype(np.float32)
        sp = (
            (np.arange(H)[:, None] // 16) * 4 + np.arange(W)[None, :] // 16
        ).astype(np.int32)  # 16 superpixels
        oh = np.zeros((R_PKL, 16), bool)
        oh[:, :4] = True
        oh[0] = False
        oh[0, 5] = True
        ids.append(i)
        boxes_l.append(boxes)
        logits_l.append(logits)
        sp_l.append(sp)
        oh_l.append(oh)
    pkl = str(tmp_path / "proposals.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(
            {
                "ids": ids,
                "boxes": boxes_l,
                "objectness_logits": logits_l,
                "superpixels": sp_l,
                "oh_labels": oh_l,
                "bbox_mode": 0,
            },
            f,
        )
    DatasetCatalog.register(name, lambda d=dicts: d)
    MetadataCatalog.get(name).set(thing_classes=["thing"], evaluator_type="coco")
    return pkl


def _cfg(name, pkl):
    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "PrecomputedProposals"
    cfg.WSL.SP_ON = True
    cfg.WSL.MAX_SUPERPIXELS = S
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.DATASETS.PROPOSAL_FILES_TRAIN = (pkl,)
    cfg.DATASETS.PROPOSAL_FILES_TEST = (pkl,)
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN = TOPK
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = TOPK
    # identity geometry: no resize, no flip => pickle values survive verbatim
    cfg.INPUT.MIN_SIZE_TRAIN = (H,)
    cfg.INPUT.MAX_SIZE_TRAIN = W
    cfg.INPUT.MIN_SIZE_TEST = H
    cfg.INPUT.MAX_SIZE_TEST = W
    cfg.INPUT.RANDOM_FLIP = "none"
    cfg.TPU.IMAGE_BUCKETS = [[H, W]]
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS = False
    cfg.DATALOADER.ASPECT_RATIO_GROUPING = False
    return cfg


def test_wsl_train_loader_superpixel_fields(tmp_path):
    name = "wsl_loader_test_train"
    pkl = _make_dataset(tmp_path, name)
    cfg = _cfg(name, pkl)
    loader = build_wsl_train_loader(cfg)
    batch = next(iter(loader))

    assert batch["proposals"].shape == (2, TOPK, 4)
    assert batch["superpixels"].shape == (2, H, W)
    assert batch["oh_labels"].shape == (2, TOPK, S)

    with open(pkl, "rb") as f:
        ref = pickle.load(f)
    for b in range(2):
        i = int(batch["image_ids"][b]) if "image_ids" in batch else b
        # identity transforms: superpixel map and top-k rows pass through
        np.testing.assert_array_equal(batch["superpixels"][b], ref["superpixels"][i])
        np.testing.assert_array_equal(
            batch["proposals"][b], ref["boxes"][i][:TOPK]
        )
        np.testing.assert_array_equal(
            batch["oh_labels"][b][:, :16], ref["oh_labels"][i][:TOPK]
        )
        assert not batch["oh_labels"][b][:, 16:].any()
    # -inf padding invariant holds for real (unpadded) rows
    assert np.isfinite(batch["proposal_scores"]).all()


def test_wsl_test_loader_superpixel_fields(tmp_path):
    name = "wsl_loader_test_eval"
    pkl = _make_dataset(tmp_path, name)
    cfg = _cfg(name, pkl)
    loader = build_wsl_test_loader(cfg, name)
    batches = list(loader)
    assert len(batches) == N_IMAGES  # batch_size 1
    for batch in batches:
        assert batch["superpixels"].shape == (1, H, W)
        assert batch["oh_labels"].shape == (1, TOPK, S)
        assert batch["oh_labels"].any()


def test_wsl_loader_flip_transforms_superpixels(tmp_path):
    """With horizontal flip forced, the superpixel map must be flipped and
    boxes mirrored — the transform_proposals_seg geometry contract."""
    name = "wsl_loader_test_flip"
    pkl = _make_dataset(tmp_path, name)
    cfg = _cfg(name, pkl)
    from jtsm_tpu.data import transforms as T
    from jtsm_tpu.wsl.data import WSLDatasetMapper, load_mcg_proposals_into_dataset

    mapper = WSLDatasetMapper(cfg, True)
    # force a deterministic flip
    mapper._mapper.augmentations = T.AugmentationList([T.RandomFlip(prob=1.0)])
    dicts = [dict(d) for d in DatasetCatalog.get(name)]
    load_mcg_proposals_into_dataset(dicts, pkl)
    out = mapper(dicts[0])
    with open(pkl, "rb") as f:
        ref = pickle.load(f)
    np.testing.assert_array_equal(
        out["proposals"]["superpixels"], ref["superpixels"][0][:, ::-1]
    )
    rb = ref["boxes"][0][:TOPK]
    flipped = np.stack([W - rb[:, 2], rb[:, 1], W - rb[:, 0], rb[:, 3]], 1)
    np.testing.assert_allclose(out["proposals"]["boxes"], flipped)
    # membership is geometry-independent
    np.testing.assert_array_equal(
        out["proposals"]["oh_labels"][:, :16], ref["oh_labels"][0][:TOPK]
    )
