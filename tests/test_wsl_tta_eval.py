"""End-to-end WSL TTA evaluation on a panoptic dataset: the WSL trainer's
test_with_TTA drives TTA-AVG (score + sem-seg merging + mask re-run on merged
boxes) and the host panoptic fusion, feeding COCO + SemSeg + COCOPanoptic
evaluators (reference projects/WSL/tools/train_net.py:199-253 +
test_time_augmentation_avg.py + mcnn.py:336-358). Regression for the flagship
JTSM eval path — the shipped jtsm yamls enable TEST.AUG."""

import importlib.util
import json
import os
import pickle
import sys

import jax
import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from jtsm_tpu.config import get_cfg
from jtsm_tpu.data import DatasetCatalog, MetadataCatalog
from jtsm_tpu.evaluation.panoptic_evaluation import id2rgb
from jtsm_tpu.wsl import add_wsl_config

H = W = 64
THING_ID, STUFF_ID = 101, 201


def _wsl_trainer_cls():
    path = os.path.join(REPO, "projects/WSL/tools/train_net.py")
    spec = importlib.util.spec_from_file_location("wsl_train_net_tta", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["wsl_train_net_tta"] = mod
    spec.loader.exec_module(mod)
    return mod.Trainer


def _register(tmp_path, name):
    img_dir = tmp_path / "imgs"
    pan_root = tmp_path / "panoptic"
    sem_dir = tmp_path / "sem"
    for d in (img_dir, pan_root, sem_dir):
        d.mkdir(exist_ok=True)
    rng = np.random.RandomState(5)
    dicts, ids, boxes_l, logits_l, pan_annos = [], [], [], [], []
    lo, hi = 8, 40
    for i in range(2):
        fname = str(img_dir / f"{i}.png")
        img = np.full((H, W, 3), 90, np.uint8)
        img[lo:hi, lo:hi] = [200, 40, 40]  # the thing
        Image.fromarray(img).save(fname)

        gt = np.full((H, W), 2, np.uint32)
        gt[lo:hi, lo:hi] = 1
        Image.fromarray(id2rgb(gt)).save(pan_root / f"{i:06d}.png")
        pan_annos.append(
            {
                "image_id": i,
                "file_name": f"{i:06d}.png",
                "segments_info": [
                    {"id": 1, "category_id": THING_ID, "iscrowd": 0, "area": (hi - lo) ** 2},
                    {"id": 2, "category_id": STUFF_ID, "iscrowd": 0, "area": H * W - (hi - lo) ** 2},
                ],
            }
        )
        sem = np.zeros((H, W), np.uint8)  # 0 = "things" slot
        sem[:] = 1
        sem[lo:hi, lo:hi] = 0
        sem_file = str(sem_dir / f"{i}.png")
        Image.fromarray(sem).save(sem_file)

        dicts.append(
            {
                "file_name": fname,
                "image_id": i,
                "height": H,
                "width": W,
                "sem_seg_file_name": sem_file,
                "annotations": [
                    {
                        "category_id": 0,
                        "bbox": [float(lo), float(lo), float(hi - lo), float(hi - lo)],
                        "bbox_mode": 1,  # XYWH
                        "iscrowd": 0,
                        "segmentation": [
                            [
                                float(lo), float(lo),
                                float(hi), float(lo),
                                float(hi), float(hi),
                                float(lo), float(hi),
                            ]
                        ],
                    }
                ],
            }
        )
        x1 = rng.rand(6) * 24
        y1 = rng.rand(6) * 24
        bxs = np.stack([x1, y1, x1 + 24, y1 + 24], 1).astype(np.float32)
        bxs[0] = [lo, lo, hi, hi]  # one good proposal
        boxes_l.append(bxs)
        logits_l.append(np.linspace(5.0, 1.0, 6).astype(np.float32))
        ids.append(i)
    pkl = str(tmp_path / "props.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(
            {"ids": ids, "boxes": boxes_l, "objectness_logits": logits_l, "bbox_mode": 0},
            f,
        )
    gt_json = {
        "annotations": pan_annos,
        "categories": [
            {"id": THING_ID, "name": "widget", "isthing": 1},
            {"id": STUFF_ID, "name": "bg", "isthing": 0},
        ],
    }
    json_path = tmp_path / "panoptic.json"
    json_path.write_text(json.dumps(gt_json))

    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)
    DatasetCatalog.register(name, lambda d=dicts: d)
    MetadataCatalog.get(name).set(
        thing_classes=["widget"],
        stuff_classes=["things", "bg"],
        evaluator_type="coco_panoptic_seg",
        panoptic_root=str(pan_root),
        panoptic_json=str(json_path),
        thing_dataset_id_to_contiguous_id={THING_ID: 0},
        stuff_dataset_id_to_contiguous_id={STUFF_ID: 1},
        ignore_label=255,
    )
    return pkl


def test_tta_eval_panoptic_end_to_end(tmp_path):
    name = "wsl_tta_eval_panoptic"
    pkl = _register(tmp_path, name)
    Trainer = _wsl_trainer_cls()

    cfg = get_cfg()
    add_wsl_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedMCNNWSL"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "PrecomputedProposals"
    cfg.MODEL.BACKBONE.NAME = "build_vgg_backbone"
    cfg.MODEL.VGG.CONV5_DILATION = 2
    cfg.MODEL.ROI_HEADS.NAME = "JTSMROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["plain5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 1e-6
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 4
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 8
    cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.SEM_SEG_HEAD.NAME = "SemSegFPNHead"
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 2
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["plain5"]
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 16
    cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE = 8
    cfg.MODEL.PANOPTIC_FPN.COMBINE.ENABLED = True
    cfg.MODEL.PANOPTIC_FPN.COMBINE.STUFF_AREA_LIMIT = 64
    cfg.MODEL.PANOPTIC_FPN.COMBINE.INSTANCES_CONFIDENCE_THRESH = 0.0
    cfg.DATASETS.TEST = (name,)
    cfg.DATASETS.PROPOSAL_FILES_TEST = (pkl,)
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 6
    cfg.TEST.EVAL_TRAIN = False
    cfg.TEST.DETECTIONS_PER_IMAGE = 4
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (H, 96)
    cfg.TEST.AUG.MAX_SIZE = 200
    cfg.TEST.AUG.FLIP = True
    cfg.TPU.IMAGE_BUCKETS = [[H, W], [96, 96], [96, 128], [128, 128]]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    cfg.freeze()

    from jtsm_tpu.modeling import build_model

    model = build_model(cfg)
    # init params on one inference-shaped batch
    rng = np.random.RandomState(0)
    import jax.numpy as jnp

    batch0 = {
        "image": jnp.asarray(rng.rand(1, H, W, 3) * 255, jnp.float32),
        "image_sizes": jnp.asarray([[H, W]], jnp.int32),
        "orig_sizes": jnp.asarray([[H, W]], jnp.int32),
        "proposals": jnp.asarray(rng.rand(1, 6, 4) * 20 + jnp.asarray([0.0, 0, 20, 20]), jnp.float32),
        "proposal_scores": jnp.zeros((1, 6)),
    }
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch0, train=False
    )

    results = Trainer.test_with_TTA(cfg, model, variables)
    assert name in results or "panoptic_seg" in results
    res = results.get(name, results)
    # all three evaluators produced sections, PQ is finite
    assert "panoptic_seg" in res, sorted(res.keys())
    assert np.isfinite(res["panoptic_seg"]["PQ"])
    assert "sem_seg" in res and np.isfinite(res["sem_seg"]["mIoU"])
    assert "bbox" in res and "segm" in res
