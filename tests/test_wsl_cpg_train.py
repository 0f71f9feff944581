"""CSC-family training drives CPG injection end-to-end through the WSL
Trainer: the batch_transform computes class-peak-gradient maps with a jitted
grad pass until WSL.CSC_MAX_ITER, after which heads fall back to the plain
MIL loss (reference roi_heads_csc.py:443 _forward_cpg + its
`iter > csc_max_iter -> None` cutoff)."""

import importlib.util
import os
import pickle
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from jtsm_tpu.config import get_cfg
from jtsm_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from jtsm_tpu.wsl import add_wsl_config

H = W = 64


def _wsl_trainer_cls():
    path = os.path.join(REPO, "projects/WSL/tools/train_net.py")
    spec = importlib.util.spec_from_file_location("wsl_train_net", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["wsl_train_net"] = mod
    spec.loader.exec_module(mod)
    return mod.Trainer


def _make_dataset(tmp_path, name):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.RandomState(7)
    dicts, ids, boxes_l, logits_l = [], [], [], []
    for i in range(2):
        fname = str(img_dir / f"{i}.png")
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(fname)
        dicts.append(
            {
                "file_name": fname, "image_id": i, "height": H, "width": W,
                "annotations": [
                    {"category_id": i % 2, "bbox": [8.0, 8.0, 24.0, 24.0],
                     "bbox_mode": 0, "iscrowd": 0}
                ],
            }
        )
        x1 = rng.rand(6) * 30
        y1 = rng.rand(6) * 30
        boxes_l.append(np.stack([x1, y1, x1 + 16, y1 + 16], 1).astype(np.float32))
        logits_l.append(np.linspace(5.0, 1.0, 6).astype(np.float32))
        ids.append(i)
    pkl = str(tmp_path / "props.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(
            {"ids": ids, "boxes": boxes_l, "objectness_logits": logits_l,
             "bbox_mode": 0}, f,
        )
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda d=dicts: d)
    MetadataCatalog.get(name).set(thing_classes=["a", "b"], evaluator_type="coco")
    return pkl


def test_csc_training_injects_cpg_until_cutoff(tmp_path):
    name = "csc_cpg_train_ds"
    pkl = _make_dataset(tmp_path, name)

    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNNWSL"
    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "PrecomputedProposals"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    # basic-block depths have fixed 64-wide res2 (reference assert)
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.RESNETS.NORM = "FrozenBN"
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.ROI_HEADS.NAME = "CSCROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 2
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 4
    cfg.WSL.CSC_MAX_ITER = 1
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.DATASETS.PROPOSAL_FILES_TRAIN = (pkl,)
    cfg.DATASETS.PROPOSAL_FILES_TEST = (pkl,)
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN = 4
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 4
    cfg.INPUT.MIN_SIZE_TRAIN = (H,)
    cfg.INPUT.MAX_SIZE_TRAIN = W
    cfg.INPUT.RANDOM_FLIP = "none"
    cfg.TPU.IMAGE_BUCKETS = [[H, W]]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.BASE_LR = 1e-5
    cfg.SOLVER.CHECKPOINT_PERIOD = 100
    cfg.TEST.EVAL_PERIOD = 0
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS = False
    cfg.DATALOADER.ASPECT_RATIO_GROUPING = False
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 3

    Trainer = _wsl_trainer_cls()
    trainer = Trainer(cfg)
    assert trainer._trainer.batch_transform is not None

    seen_keys = []
    orig = trainer._trainer._write_metrics

    def spy(metrics, dt):
        seen_keys.append(frozenset(metrics.keys()))
        return orig(metrics, dt)

    trainer._trainer._write_metrics = spy
    trainer.resume_or_load(resume=False)
    trainer.train()

    # iters 0 and 1 (<= CSC_MAX_ITER) train with the CSC pos/neg losses;
    # iter 2 passes the cutoff and falls back to the plain MIL loss
    assert seen_keys[0] >= {"loss_cls_pos", "loss_cls_neg"}
    assert seen_keys[1] >= {"loss_cls_pos", "loss_cls_neg"}
    assert "loss_mil" in seen_keys[2] and "loss_cls_pos" not in seen_keys[2]
