#!/usr/bin/env python
"""WSL training CLI (reference: projects/WSL/tools/train_net.py:56) —
gradient accumulation (WSL.ITER_SIZE), superpixel-aware loaders, WSOD TTA."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

import jax
import jax.numpy as jnp

import jtsm_tpu.wsl  # registers WSL components
from jtsm_tpu.config import get_cfg
from jtsm_tpu.engine import (
    DefaultTrainer,
    default_argument_parser,
    default_setup,
    launch,
)
from jtsm_tpu.wsl import add_wsl_config


class Trainer(DefaultTrainer):
    """WSL trainer: the reference accumulates gradients over WSL.ITER_SIZE
    mini-batches and skips empty-instance batches (train_net.py:74-119). On
    TPU the skip is unnecessary (static batches carry validity masks) and
    accumulation is optax.MultiSteps on the optimizer."""

    def __init__(self, cfg):
        super().__init__(cfg)
        # CSC-family heads consume class-peak-gradient maps each step
        # (reference GeneralizedRCNNWSL.has_cpg + roi_heads_csc _forward_cpg)
        from jtsm_tpu.wsl.modeling.wsjds import (
            CPG_ROI_HEADS,
            make_cpg_batch_transform,
        )

        if cfg.MODEL.ROI_HEADS.NAME in CPG_ROI_HEADS:
            self._trainer.batch_transform = make_cpg_batch_transform(
                self.model, cfg.WSL.CSC_MAX_ITER, cfg.MODEL.ROI_HEADS.NUM_CLASSES
            )

    @classmethod
    def build_optimizer(cls, cfg, params):
        """Gradient accumulation over WSL.ITER_SIZE mini-batches
        (reference train_net.py:74-119 accumulates manually; here it is
        optax.MultiSteps around the standard optimizer)."""
        import optax

        from jtsm_tpu.solver import build_optimizer

        tx = build_optimizer(cfg, params)
        if cfg.WSL.ITER_SIZE > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=cfg.WSL.ITER_SIZE)
        return tx

    @classmethod
    def build_train_loader(cls, cfg):
        """Superpixel-aware loader (reference wsl/data/build.py SP variants):
        when WSL.SP_ON, batches gain `superpixels` (B, H, W) and `oh_labels`
        (B, R, S) fields consumed by MOIPool."""
        from jtsm_tpu.wsl.data import build_wsl_train_loader

        return build_wsl_train_loader(cfg)

    @classmethod
    def build_test_loader(cls, cfg, dataset_name):
        from jtsm_tpu.wsl.data import build_wsl_test_loader

        return build_wsl_test_loader(cfg, dataset_name)

    @classmethod
    def build_evaluator(cls, cfg, dataset_name, output_folder=None):
        from jtsm_tpu.data import MetadataCatalog
        from jtsm_tpu.evaluation import (
            COCOEvaluator,
            COCOPanopticEvaluator,
            DatasetEvaluators,
            PascalVOCDetectionEvaluator,
            SemSegEvaluator,
        )

        if output_folder is None:
            output_folder = os.path.join(cfg.OUTPUT_DIR, "inference")
        t = MetadataCatalog.get(dataset_name).get("evaluator_type", "coco")
        evals = []
        if t == "pascal_voc":
            evals.append(PascalVOCDetectionEvaluator(dataset_name))
        if t in ("coco", "coco_panoptic_seg"):
            evals.append(COCOEvaluator(dataset_name, output_dir=output_folder))
        if t == "coco_panoptic_seg":
            # reference tools/train_net.py:54-86 adds the stuff-branch
            # SemSegEvaluator alongside the panoptic one
            evals.append(SemSegEvaluator(dataset_name, output_dir=output_folder))
            evals.append(COCOPanopticEvaluator(dataset_name, output_folder))
        return evals[0] if len(evals) == 1 else DatasetEvaluators(evals)

    _vis_test_dumped = 0

    @classmethod
    def on_test_outputs(cls, cfg, batch, outputs, dataset_name):
        """cfg.WSL.VIS_TEST (reference roi_heads_oicr.py:211 etc. — the WSL
        heads dump per-image detection visualizations at test time): draw
        the first image of each batch with its predicted boxes and save to
        OUTPUT_DIR/vis_test/. Capped at 50 images per run."""
        if not cfg.WSL.VIS_TEST or cls._vis_test_dumped >= 50:
            return
        import numpy as np

        from jtsm_tpu.utils.visualizer import Visualizer

        out = {k: np.asarray(v) for k, v in outputs.items() if not isinstance(v, (list, tuple))}
        if "boxes" not in out:
            return
        img = np.asarray(batch["image"][0]).clip(0, 255).astype(np.uint8)
        vis = Visualizer(img)
        vis.draw_instance_predictions({k: out[k][0] for k in ("boxes", "scores", "classes", "valid") if k in out})
        d = os.path.join(cfg.OUTPUT_DIR, "vis_test")
        os.makedirs(d, exist_ok=True)
        vis.get_output().save(
            os.path.join(d, f"{dataset_name}_{cls._vis_test_dumped:04d}.png")
        )
        cls._vis_test_dumped += 1

    @classmethod
    def test_with_TTA(cls, cfg, model, variables):
        """Reference projects/WSL/tools/train_net.py:219 (test_with_TTA_WSL):
        use AVG merging (scores averaged across scales/flips over the FIXED
        precomputed proposals) for WSOD models; UNION otherwise."""
        if cfg.MODEL.PROPOSAL_GENERATOR.NAME != "PrecomputedProposals":
            return DefaultTrainer.test_with_TTA(cfg, model, variables)

        from collections import OrderedDict

        import numpy as np

        from jtsm_tpu.data import DatasetCatalog, MetadataCatalog
        from jtsm_tpu.data.build import get_detection_dataset_dicts
        from jtsm_tpu.data.detection_utils import read_image
        from jtsm_tpu.modeling.test_time_augmentation import GeneralizedRCNNWithTTAAVG

        jitted = jax.jit(lambda v, b: model.apply(v, b, train=False))

        def predict(batch):
            return jitted(variables, {k: jnp.asarray(v) for k, v in batch.items()})

        tta = GeneralizedRCNNWithTTAAVG(
            predict,
            min_sizes=tuple(cfg.TEST.AUG.MIN_SIZES),
            max_size=cfg.TEST.AUG.MAX_SIZE,
            flip=cfg.TEST.AUG.FLIP,
            buckets=[tuple(b) for b in cfg.TPU.IMAGE_BUCKETS],
        )
        topk = cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST
        results = OrderedDict()
        # WSOD convention: TTA eval also covers the TRAIN datasets
        # (corloc-style eval-on-train, reference train_net.py:220-253)
        eval_sets = [
            (n, cfg.DATASETS.PROPOSAL_FILES_TEST[i] if cfg.DATASETS.PROPOSAL_FILES_TEST else None)
            for i, n in enumerate(cfg.DATASETS.TEST)
        ]
        if cfg.TEST.EVAL_TRAIN:
            eval_sets += [
                (n, cfg.DATASETS.PROPOSAL_FILES_TRAIN[i] if cfg.DATASETS.PROPOSAL_FILES_TRAIN else None)
                for i, n in enumerate(cfg.DATASETS.TRAIN)
                if n not in cfg.DATASETS.TEST
            ]
        for dataset_name, pf_one in eval_sets:
            pf = [pf_one] if pf_one else None
            sp_loader = None
            if cfg.WSL.SP_ON:
                from jtsm_tpu.wsl.data import load_mcg_proposals_into_dataset

                sp_loader = load_mcg_proposals_into_dataset
            dicts = get_detection_dataset_dicts(
                [dataset_name],
                filter_empty=False,
                proposal_files=pf,
                proposal_loader=sp_loader,
            )
            evaluator = cls.build_evaluator(cfg, dataset_name)
            evaluator.reset()
            for d in dicts:
                img = read_image(d["file_name"], cfg.INPUT.FORMAT).astype(np.float32)
                boxes = np.asarray(d.get("proposal_boxes", np.zeros((0, 4))), np.float32)
                logits = np.asarray(
                    d.get("proposal_objectness_logits", np.zeros((0,))), np.float32
                )
                order = np.argsort(-logits)[:topk]
                boxes, logits = boxes[order], logits[order]
                superpixels = d.get("proposal_superpixels")
                oh = d.get("proposal_oh_labels")
                if oh is not None:
                    s_cap = cfg.WSL.MAX_SUPERPIXELS
                    oh = np.asarray(oh, bool)[order]
                    oh_pad = np.zeros((topk, s_cap), bool)
                    oh_pad[: len(oh), : min(oh.shape[1], s_cap)] = oh[
                        :, :s_cap
                    ]
                    oh = oh_pad
                if superpixels is not None:
                    superpixels = np.clip(
                        np.asarray(superpixels, np.int32),
                        0,
                        cfg.WSL.MAX_SUPERPIXELS - 1,
                    )
                # pad to the static proposal capacity (-inf marks padding)
                pad = topk - len(boxes)
                if pad > 0:
                    boxes = np.concatenate([boxes, np.zeros((pad, 4), np.float32)])
                    logits = np.concatenate(
                        [logits, np.full((pad,), -np.inf, np.float32)]
                    )
                merged = tta(
                    img,
                    boxes,
                    logits,
                    predict,
                    score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
                    nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                    topk=cfg.TEST.DETECTIONS_PER_IMAGE,
                    superpixels=superpixels,
                    oh_labels=oh,
                )
                det = merged["detections"]
                n = len(det["boxes"])
                outputs = {
                    "boxes": det["boxes"][None],
                    "scores": det["scores"][None],
                    "classes": det["classes"][None],
                    "valid": np.ones((1, n), bool),
                }
                if "masks" in det:
                    outputs["masks"] = det["masks"][None]
                if "sem_seg_logits" in merged:
                    outputs["sem_seg"] = np.argmax(merged["sem_seg_logits"], -1)[None]
                combine_on = (
                    cfg.MODEL.PANOPTIC_FPN.COMBINE.ENABLED
                    and MetadataCatalog.get(dataset_name).get("evaluator_type")
                    == "coco_panoptic_seg"
                )
                if combine_on and "sem_seg_logits" in merged:
                    # host panoptic fusion on the TTA-merged outputs
                    # (reference mcnn.py:351-358 runs the combine after TTA
                    # postprocess too); everything is already at original res
                    from jtsm_tpu.modeling.meta_arch.panoptic_fpn import (
                        panoptic_fusion_postprocess,
                    )

                    sizes = np.asarray([[d["height"], d["width"]]])
                    outputs = panoptic_fusion_postprocess(
                        dict(outputs, sem_seg_logits=merged["sem_seg_logits"][None]),
                        sizes,
                        sizes,
                        cfg.MODEL.PANOPTIC_FPN.COMBINE.OVERLAP_THRESH,
                        cfg.MODEL.PANOPTIC_FPN.COMBINE.STUFF_AREA_LIMIT,
                        cfg.MODEL.PANOPTIC_FPN.COMBINE.INSTANCES_CONFIDENCE_THRESH,
                    )
                inputs = {
                    "image_ids": np.asarray([d.get("image_id", -1)]),
                    "orig_sizes": np.asarray([[d["height"], d["width"]]]),
                }
                evaluator.process(inputs, outputs)
            results[dataset_name] = evaluator.evaluate() or {}
        if len(results) == 1:
            results = list(results.values())[0]
        return results


def setup(args):
    cfg = get_cfg()
    add_wsl_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    return cfg


def main(args):
    cfg = setup(args)
    if args.eval_only:
        from jtsm_tpu.checkpoint import DetectionCheckpointer
        from jtsm_tpu.modeling import build_model

        model = build_model(cfg)
        bh = max(b[0] for b in cfg.TPU.IMAGE_BUCKETS)
        bw = max(b[1] for b in cfg.TPU.IMAGE_BUCKETS)
        r = cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST
        dummy = {
            "image": jnp.zeros((1, bh, bw, 3), jnp.float32),
            "image_sizes": jnp.asarray([[bh, bw]], jnp.int32),
            "orig_sizes": jnp.asarray([[bh, bw]], jnp.int32),
            "proposals": jnp.zeros((1, r, 4)),
            "proposal_scores": jnp.zeros((1, r)),
        }
        rng = jax.random.key(0)
        variables = jax.jit(
            lambda k: model.init({"params": k, "sampling": k, "dropout": k}, dummy, train=False)
        )(rng)
        ckpt = DetectionCheckpointer(dict(variables), cfg.OUTPUT_DIR)
        ckpt.resume_or_load(cfg.MODEL.WEIGHTS, resume=args.resume)
        res = Trainer.test(cfg, model, variables=ckpt.variables)
        if cfg.TEST.EXPECTED_RESULTS:
            from jtsm_tpu.evaluation import verify_results

            verify_results(cfg, res)
        return res

    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    return trainer.train()


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    launch(main, args.num_gpus, args=(args,))
