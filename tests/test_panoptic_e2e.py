"""End-to-end panoptic pipeline: model outputs -> host fusion
(`panoptic_fusion_postprocess`) -> COCOPanopticEvaluator PQ.

Mirrors the reference flow PanopticFPN.inference (panoptic_fpn.py:109-130) /
GeneralizedMCNNWSL._postprocess_ps (mcnn.py:336-358) -> panopticapi PQ.
"""

import json
import os

import numpy as np
import pytest

from jtsm_tpu.data import DatasetCatalog, MetadataCatalog
from jtsm_tpu.evaluation import COCOPanopticEvaluator
from jtsm_tpu.evaluation.panoptic_evaluation import id2rgb
from jtsm_tpu.modeling.meta_arch.panoptic_fpn import panoptic_fusion_postprocess

THING_ID, STUFF_ID = 101, 201  # dataset category ids


def _register_synthetic_panoptic(tmp_path, name, num_things=1, size=32, image_ids=(7,)):
    """Per image: a thing box [size/8 : size*5/8) on a stuff background."""
    from PIL import Image

    pan_root = tmp_path / "panoptic"
    pan_root.mkdir(exist_ok=True)
    lo, hi = size // 8, size * 5 // 8
    annotations = []
    for img_id in image_ids:
        gt = np.full((size, size), 2, np.uint32)  # stuff segment id 2
        gt[lo:hi, lo:hi] = 1  # thing segment id 1
        Image.fromarray(id2rgb(gt)).save(pan_root / f"{img_id:06d}.png")
        annotations.append(
            {
                "image_id": img_id,
                "file_name": f"{img_id:06d}.png",
                "segments_info": [
                    {
                        "id": 1,
                        "category_id": THING_ID,
                        "iscrowd": 0,
                        "area": (hi - lo) ** 2,
                    },
                    {
                        "id": 2,
                        "category_id": STUFF_ID,
                        "iscrowd": 0,
                        "area": size * size - (hi - lo) ** 2,
                    },
                ],
            }
        )
    gt_json = {
        "annotations": annotations,
        "categories": [
            {"id": THING_ID + i, "name": f"widget{i}", "isthing": 1}
            for i in range(num_things)
        ]
        + [{"id": STUFF_ID, "name": "bg", "isthing": 0}],
    }
    json_path = tmp_path / "panoptic.json"
    json_path.write_text(json.dumps(gt_json))

    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)
    DatasetCatalog.register(name, lambda: [])
    MetadataCatalog.get(name).set(
        panoptic_root=str(pan_root),
        panoptic_json=str(json_path),
        evaluator_type="coco_panoptic_seg",
        thing_dataset_id_to_contiguous_id={
            THING_ID + i: i for i in range(num_things)
        },
        stuff_dataset_id_to_contiguous_id={STUFF_ID: 1},
        thing_classes=[f"widget{i}" for i in range(num_things)],
        stuff_classes=["things", "bg"],
        ignore_label=255,
    )
    return name


def _perfect_outputs():
    """Model-format outputs that reproduce the GT exactly."""
    h = w = 32
    sem_logits = np.zeros((1, h, w, 2), np.float32)
    sem_logits[..., 1] = 1.0  # stuff everywhere
    sem_logits[0, 4:20, 4:20, 0] = 2.0  # "things" inside the box
    return {
        "boxes": np.asarray([[[4.0, 4.0, 20.0, 20.0]]], np.float32),
        "scores": np.asarray([[0.9]], np.float32),
        "classes": np.asarray([[0]], np.int32),
        "valid": np.asarray([[True]]),
        "masks": np.ones((1, 1, 28, 28), np.float32),
        "sem_seg_logits": sem_logits,
    }


def test_fusion_identity_pq_100(tmp_path):
    name = _register_synthetic_panoptic(tmp_path, "panoptic_e2e_perfect")
    sizes = np.asarray([[32, 32]], np.int32)
    fused = panoptic_fusion_postprocess(
        _perfect_outputs(), sizes, sizes, stuff_area_limit=100
    )
    assert "panoptic_seg" in fused and len(fused["panoptic_seg"]) == 1
    id_map, segments = fused["panoptic_seg"][0]
    assert id_map.shape == (32, 32)
    assert len(segments) == 2  # one thing + one stuff
    assert fused["sem_seg"][0].shape == (32, 32)

    evaluator = COCOPanopticEvaluator(name)
    evaluator.reset()
    evaluator.process({"image_ids": np.asarray([7])}, fused)
    res = evaluator.evaluate()["panoptic_seg"]
    assert res["PQ"] == pytest.approx(100.0)
    assert res["PQ_th"] == pytest.approx(100.0)
    assert res["PQ_st"] == pytest.approx(100.0)


def test_fusion_orig_size_rescale(tmp_path):
    """Fusion resizes sem-seg and pastes masks at the ORIGINAL resolution."""
    outputs = _perfect_outputs()
    outputs["boxes"] = outputs["boxes"] * 2.0  # detector boxes at orig scale
    fused = panoptic_fusion_postprocess(
        outputs,
        np.asarray([[32, 32]], np.int32),
        np.asarray([[64, 64]], np.int32),
        stuff_area_limit=100,
    )
    id_map, segments = fused["panoptic_seg"][0]
    assert id_map.shape == (64, 64)
    assert fused["sem_seg"][0].shape == (64, 64)
    thing = [s for s in segments if s["isthing"]]
    # ~32x32 box; bilinear paste support extends <=1px past each edge
    assert len(thing) == 1 and 900 <= thing[0]["area"] <= 34 * 34


def test_panoptic_fpn_model_to_pq(tmp_path):
    """Tiny random-weight PanopticFPN -> fusion -> PQ evaluates (finite)."""
    import jax
    import jax.numpy as jnp

    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.modeling import build_model

    name = _register_synthetic_panoptic(
        tmp_path, "panoptic_e2e_model", num_things=5, size=128, image_ids=(7, 8)
    )
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16], [32], [64], [128], [256]]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 64
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 32
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 2
    model = build_model(cfg)

    b, h, w, g = 2, 64, 64, 4
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        "image_sizes": jnp.tile(jnp.asarray([[h - 8, w - 4]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[2 * h, 2 * w]], jnp.int32), (b, 1)),
        "gt_boxes": jnp.asarray(
            np.concatenate(
                [rng.rand(b, g, 2) * 20, 20 + rng.rand(b, g, 2) * 20], axis=-1
            ).astype(np.float32)
        ),
        "gt_classes": jnp.asarray(rng.randint(0, 5, (b, g)), jnp.int32),
        "gt_valid": jnp.asarray([[True] * (g - 1) + [False]] * b),
        "gt_mask_crops": jnp.asarray(rng.rand(b, g, 28, 28) > 0.5),
        "gt_sem_seg": jnp.asarray(rng.randint(0, 2, (b, h, w)), jnp.int32),
    }
    rngs = {"params": jax.random.key(0), "sampling": jax.random.key(1)}
    variables = model.init(rngs, batch, train=True)
    out = model.apply(variables, batch, train=False)

    np_out = {k: np.asarray(v) for k, v in out.items()}
    fused = panoptic_fusion_postprocess(
        np_out,
        np.asarray(batch["image_sizes"]),
        np.asarray(batch["orig_sizes"]),
        instances_confidence_threshold=0.0,
    )
    assert len(fused["panoptic_seg"]) == 2

    evaluator = COCOPanopticEvaluator(name)
    evaluator.reset()
    evaluator.process({"image_ids": np.asarray([7, 8])}, fused)
    res = evaluator.evaluate()["panoptic_seg"]
    for k in ("PQ", "SQ", "RQ"):
        assert np.isfinite(res[k])


def test_build_evaluator_panoptic_set(tmp_path):
    """coco_panoptic_seg datasets get COCO + SemSeg + COCOPanoptic evaluators
    (reference tools/train_net.py:54-86)."""
    from jtsm_tpu.engine.defaults import DefaultTrainer
    from jtsm_tpu.evaluation import (
        COCOEvaluator,
        DatasetEvaluators,
        SemSegEvaluator,
    )

    name = _register_synthetic_panoptic(tmp_path, "panoptic_e2e_build")
    # COCOEvaluator needs an instances view; give it a minimal one
    inst_json = tmp_path / "instances.json"
    inst_json.write_text(
        json.dumps(
            {
                "images": [
                    {"id": 7, "file_name": "000007.png", "height": 32, "width": 32}
                ],
                "annotations": [],
                "categories": [{"id": THING_ID, "name": "widget"}],
            }
        )
    )
    MetadataCatalog.get(name).set(json_file=str(inst_json))
    ev = DefaultTrainer.build_evaluator(
        get_cfg_for(tmp_path), name, output_folder=str(tmp_path / "out")
    )
    assert isinstance(ev, DatasetEvaluators)
    kinds = {type(e) for e in ev._evaluators}
    assert COCOEvaluator in kinds
    assert SemSegEvaluator in kinds
    assert COCOPanopticEvaluator in kinds


def get_cfg_for(tmp_path):
    from jtsm_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.OUTPUT_DIR = str(tmp_path / "output")
    return cfg
