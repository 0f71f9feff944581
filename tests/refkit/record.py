"""Build + run the REFERENCE torch models on CPU and record stage-by-stage
tensors for the model-parity tests (tests/test_reference_model_parity.py).

Cases are cached per-session in /tmp (keyed by a version tag) because the
torch forward takes a couple of minutes on the single-core host.

Weight randomization: default init gives near-uniform heads whose rankings
are decided by float noise; weights are re-randomized with seeded
generators and the decision heads (rpn objectness, cls_score) are scaled up
so score gaps are decisive. POOLER_SAMPLING_RATIO is pinned to 2 on both
so score gaps are decisive. Pooler sampling stays at the reference default
(0 = per-ROI adaptive — reproduced exactly by jtsm_tpu/ops/roi_align.py's
adaptive mode).
"""

import os

import numpy as np

VERSION = "v5"
CACHE_DIR = os.environ.get("JTSM_REFCASE_CACHE", "/tmp/jtsm_refcases")

CASES = {
    "maskrcnn_r50fpn": dict(
        config="/root/reference/configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml",
        n_images=2,
        size=(320, 320),
    ),
    "fasterrcnn_r50c4": dict(
        config="/root/reference/configs/COCO-Detection/faster_rcnn_R_50_C4_1x.yaml",
        n_images=2,
        size=(256, 256),
    ),
}


def _randomize(ref_model, torch):
    g = torch.Generator().manual_seed(42)
    with torch.no_grad():
        for _, p in ref_model.named_parameters():
            if p.ndim >= 2:
                p.normal_(0, 0.02, generator=g)
            else:
                p.normal_(0, 0.01, generator=g)
        for name, b in ref_model.named_buffers():
            if name.endswith("running_mean"):
                b.normal_(0, 0.5, generator=g)
            elif name.endswith("running_var"):
                b.uniform_(0.5, 2.0, generator=g)
            elif name.endswith("weight"):
                b.uniform_(0.7, 1.3, generator=g)
            elif name.endswith("bias"):
                b.normal_(0, 0.2, generator=g)
        ref_model.roi_heads.box_predictor.cls_score.weight.mul_(8.0)
        if hasattr(ref_model.proposal_generator, "rpn_head"):
            ref_model.proposal_generator.rpn_head.objectness_logits.weight.mul_(4.0)


def get_case(name: str) -> dict:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"{name}_{VERSION}.npz")
    if os.path.exists(path):
        return dict(np.load(path))
    rec = _record(name)
    np.savez_compressed(path, **rec)
    return rec


def _record(name: str) -> dict:
    from . import import_reference

    import_reference()
    import torch
    from detectron2.config import get_cfg as ref_get_cfg
    from detectron2.modeling import build_model as ref_build_model
    from detectron2.modeling.postprocessing import detector_postprocess

    spec = CASES[name]
    cfg = ref_get_cfg()
    cfg.merge_from_file(spec["config"])
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.WEIGHTS = ""
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.02
    # reference defaults kept: POOLER_SAMPLING_RATIO 0 = per-ROI adaptive,
    # which the repo's gather-path ROIAlign reproduces exactly
    torch.manual_seed(17)
    ref_model = ref_build_model(cfg)
    ref_model.eval()
    _randomize(ref_model, torch)

    sd = {
        k: v.detach().numpy().copy()
        for k, v in ref_model.state_dict().items()
        if "num_batches" not in k and "cell_anchors" not in k
    }

    rng = np.random.RandomState(3)
    H, W = spec["size"]
    imgs_np = [
        rng.randint(0, 255, (3, H, W)).astype("float32")
        for _ in range(spec["n_images"])
    ]
    inputs = [
        {"image": torch.from_numpy(im), "height": H, "width": W} for im in imgs_np
    ]

    rec = {}
    with torch.no_grad():
        images = ref_model.preprocess_image(inputs)
        features = ref_model.backbone(images.tensor)
        for k, v in features.items():
            rec[f"feat_{k}"] = v.numpy()

        rpn = ref_model.proposal_generator
        rpn_feats = [features[f] for f in rpn.in_features]
        logits, deltas = rpn.rpn_head(rpn_feats)
        for li, (lg, dl) in enumerate(zip(logits, deltas)):
            rec[f"rpn_logits_l{li}"] = lg.numpy()
            rec[f"rpn_deltas_l{li}"] = dl.numpy()

        proposals, _ = rpn(images, features, None)
        for i, p in enumerate(proposals):
            rec[f"prop_boxes{i}"] = p.proposal_boxes.tensor.numpy()
            rec[f"prop_logits{i}"] = p.objectness_logits.numpy()

        rh = ref_model.roi_heads
        if hasattr(rh, "box_pooler"):  # StandardROIHeads (FPN)
            box_feats = [features[f] for f in rh.box_in_features]
            pooled = rh.box_pooler(
                box_feats, [p.proposal_boxes for p in proposals]
            )
            rec["pooled_box_features"] = pooled.numpy()
            bf = rh.box_head(pooled)
            scores, prop_deltas = rh.box_predictor(bf)
        else:  # Res5ROIHeads (C4)
            pooled = rh.pooler(
                [features[f] for f in rh.in_features],
                [p.proposal_boxes for p in proposals],
            )
            rec["pooled_box_features"] = pooled.numpy()
            bf = rh.res5(pooled).mean(dim=[2, 3])
            scores, prop_deltas = rh.box_predictor(bf)
        rec["box_scores"] = scores.numpy()
        rec["box_deltas"] = prop_deltas.numpy()

        results, _ = rh(images, features, proposals, None)
        if results and results[0].has("pred_masks"):
            # re-run the mask branch manually to capture pre-paste logits
            if hasattr(rh, "mask_pooler"):
                mask_feats = [features[f] for f in rh.mask_in_features]
                mp = rh.mask_pooler(
                    mask_feats, [r.pred_boxes for r in results]
                )
                rec["pooled_mask_features"] = mp.numpy()
                rec["mask_logits"] = rh.mask_head.layers(mp).numpy()

        outs = [detector_postprocess(r, H, W) for r in results]

    for i, inst in enumerate(outs):
        rec[f"boxes{i}"] = inst.pred_boxes.tensor.numpy()
        rec[f"scores{i}"] = inst.scores.numpy()
        rec[f"classes{i}"] = inst.pred_classes.numpy()
        if inst.has("pred_masks"):
            rec[f"masks{i}"] = inst.pred_masks.numpy()
    for i, im in enumerate(imgs_np):
        rec[f"image{i}"] = im
    for k, v in sd.items():
        rec["sd." + k] = v
    return rec


# ------------------------------------------------------------- train losses
TRAINLOSS_VERSION = "tl1"


def trainloss_cfg_overrides(cfg):
    """Applied identically to the reference and repo cfgs: shrink to
    R18-FPN AND make every sampling step deterministic by budgeting more
    slots than candidates at positive fraction 1.0 — subsample_labels then
    keeps EVERYTHING on both sides, so the loss sets coincide and the loss
    dict can be compared numerically."""
    trained_cfg_overrides(cfg)
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 8192  # > 4092 anchors at 128x128
    cfg.MODEL.RPN.POSITIVE_FRACTION = 1.0
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 384  # > 256 post-NMS + gt
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0


def get_train_loss_case() -> dict:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"trainloss_r18fpn_{TRAINLOSS_VERSION}.npz")
    if os.path.exists(path):
        return dict(np.load(path))
    rec = _record_train_loss()
    np.savez_compressed(path, **rec)
    return rec


def _record_train_loss() -> dict:
    """Reference Mask R-CNN (R18-FPN shrink) train-mode forward on seeded
    random weights + a fixed synthetic GT batch; records the loss dict
    (loss_rpn_cls/loss_rpn_loc/loss_cls/loss_box_reg/loss_mask —
    rpn.py:313-344, fast_rcnn.py:144-260, mask_head.py:40-90) plus the
    post-sampling proposal sets for diagnosis."""
    from . import import_reference

    import_reference()
    import torch
    from detectron2.config import get_cfg as ref_get_cfg
    from detectron2.modeling import build_model as ref_build_model
    from detectron2.structures import BitMasks, Boxes, Instances
    from detectron2.utils.events import EventStorage

    cfg = ref_get_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml"
    )
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.WEIGHTS = ""
    trainloss_cfg_overrides(cfg)
    torch.manual_seed(17)
    model = ref_build_model(cfg)
    model.train()
    _randomize(model, torch)

    rng = np.random.RandomState(5)
    images, gts = make_synthetic_detection_set(rng)
    nb = 4
    inputs = []
    for i in range(nb):
        inst = Instances((IMG_SIZE, IMG_SIZE))
        inst.gt_boxes = Boxes(
            torch.tensor([a["bbox"] for a in gts[i]], dtype=torch.float32)
        )
        inst.gt_classes = torch.tensor(
            [a["category_id"] for a in gts[i]], dtype=torch.int64
        )
        inst.gt_masks = BitMasks(
            torch.from_numpy(np.stack([a["mask"] for a in gts[i]]))
        )
        inputs.append(
            {
                "image": torch.from_numpy(images[i]),
                "height": IMG_SIZE,
                "width": IMG_SIZE,
                "instances": inst,
            }
        )

    sampled_props = []
    rh = model.roi_heads
    orig = rh.label_and_sample_proposals

    def wrap(proposals, targets):
        out = orig(proposals, targets)
        sampled_props.append(out)
        return out

    rh.label_and_sample_proposals = wrap

    with EventStorage(0), torch.no_grad():
        losses = model(inputs)

    rec = {}
    for name, val in losses.items():
        rec[f"loss.{name}"] = np.asarray(float(val), np.float64)
    for i, p in enumerate(sampled_props[0]):
        rec[f"sampled_boxes{i}"] = p.proposal_boxes.tensor.numpy()
        rec[f"sampled_gt_classes{i}"] = p.gt_classes.numpy()
    for i in range(nb):
        rec[f"image{i}"] = images[i]
        rec[f"gt_boxes{i}"] = np.asarray([a["bbox"] for a in gts[i]], np.float32)
        rec[f"gt_classes{i}"] = np.asarray(
            [a["category_id"] for a in gts[i]], np.int64
        )
        rec[f"gt_masks{i}"] = np.stack([a["mask"] for a in gts[i]]).astype(np.uint8)
    for k, v in model.state_dict().items():
        if "num_batches" not in k and "cell_anchors" not in k:
            rec["sd." + k] = v.detach().numpy().copy()
    return rec


# ---------------------------------------------------------------- trained AP
TRAIN_VERSION = "t4"
TRAIN_ITERS = 600
N_TRAIN_IMAGES = 24
IMG_SIZE = 128
N_CLASSES = 3

# Architectures covered by the torch-trained AP-parity tier. "r18fpn" is the
# flagship Mask R-CNN case; "r18c4" exercises the single-level C4 pathway
# (res4 features -> RoIAlign -> shared res5 box head, reference
# roi_heads.py Res5ROIHeads) whose stage parity previously had no AP-level
# assert. C4 has no mask branch (faster_rcnn_R_50_C4_1x.yaml: MASK_ON False).
TRAINED_ARCHS = {
    "r18fpn": dict(
        config="configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml",
        mask_on=True,
        iters=TRAIN_ITERS,
        lr=0.005,
    ),
    "r18c4": dict(
        config="configs/COCO-Detection/faster_rcnn_R_50_C4_1x.yaml",
        mask_on=False,
        iters=450,
        lr=0.01,  # the coarse single-level (stride-16) RPN needs more push
    ),
}


def make_synthetic_detection_set(rng):
    """(images uint8 (N, 3, S, S) BGR-ish, gts) — colored rectangles on
    noise; class = color family. Shared by the torch trainer and the AP
    comparison."""
    images, gts = [], []
    colors = [(200, 40, 40), (40, 200, 40), (40, 40, 200)]
    for _ in range(N_TRAIN_IMAGES):
        img = rng.randint(0, 60, (IMG_SIZE, IMG_SIZE, 3)).astype(np.uint8)
        anns = []
        # disjoint quadrant placement: overlapping rects paint over each
        # other, which makes class/box evidence ambiguous at this tiny scale
        half = IMG_SIZE // 2
        quads = [(0, 0), (half, 0), (0, half), (half, half)]
        rng.shuffle(quads)
        for qx, qy in quads[: rng.randint(1, 4)]:
            w = rng.randint(28, half - 8)
            h = rng.randint(28, half - 8)
            x0 = qx + rng.randint(2, half - w - 2)
            y0 = qy + rng.randint(2, half - h - 2)
            c = rng.randint(0, N_CLASSES)
            col = np.asarray(colors[c]) + rng.randint(-20, 20, 3)
            img[y0 : y0 + h, x0 : x0 + w] = np.clip(col, 0, 255)
            mask = np.zeros((IMG_SIZE, IMG_SIZE), bool)
            mask[y0 : y0 + h, x0 : x0 + w] = True
            anns.append(
                {"bbox": [x0, y0, x0 + w, y0 + h], "category_id": c, "mask": mask}
            )
        images.append(img.transpose(2, 0, 1).astype(np.float32))
        gts.append(anns)
    return images, gts


def get_trained_case(arch: str = "r18fpn") -> dict:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"trained_{arch}_{TRAIN_VERSION}.npz")
    if os.path.exists(path):
        return dict(np.load(path))
    rec = _record_trained(arch)
    np.savez_compressed(path, **rec)
    return rec


def trained_cfg_overrides(cfg, arch: str = "r18fpn"):
    """Shrink the architecture to R18 scale for the synthetic AP case —
    applied identically to the reference cfg and the repo cfg."""
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.RESNETS.NORM = "BN" if False else "FrozenBN"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = N_CLASSES
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 512
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 1024
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 256
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.TEST.DETECTIONS_PER_IMAGE = 16
    if arch == "r18c4":
        # single res4 feature map (stride 16 -> 8x8 at 128px): all anchor
        # sizes live on the one level, like the reference C4 yaml's
        # [[32, 64, 128, 256, 512]] scaled to the 28-56 px objects here
        cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16, 32, 64, 96, 128]]
        # the res5 box head dominates CPU train cost (~12 s/iter at the
        # reference 14x14 pool with 64 ROIs/image on the 1-core host) —
        # shrink pool + ROI budget identically on both sides
        cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
        cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    else:
        cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16], [32], [64], [96], [128]]


def _record_trained(arch: str = "r18fpn") -> dict:
    from . import import_reference

    import_reference()
    import torch
    from detectron2.config import get_cfg as ref_get_cfg
    from detectron2.modeling import build_model as ref_build_model
    from detectron2.structures import BitMasks, Boxes, Instances

    spec = TRAINED_ARCHS[arch]
    cfg = ref_get_cfg()
    cfg.merge_from_file(os.path.join("/root/reference", spec["config"]))
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.WEIGHTS = ""
    trained_cfg_overrides(cfg, arch)
    torch.manual_seed(11)
    model = ref_build_model(cfg)

    rng = np.random.RandomState(5)
    images, gts = make_synthetic_detection_set(rng)

    def to_inputs(idx):
        out = []
        for i in idx:
            inst = Instances((IMG_SIZE, IMG_SIZE))
            inst.gt_boxes = Boxes(
                torch.tensor([a["bbox"] for a in gts[i]], dtype=torch.float32)
            )
            inst.gt_classes = torch.tensor(
                [a["category_id"] for a in gts[i]], dtype=torch.int64
            )
            inst.gt_masks = BitMasks(
                torch.from_numpy(np.stack([a["mask"] for a in gts[i]]))
            )
            out.append(
                {
                    "image": torch.from_numpy(images[i]),
                    "height": IMG_SIZE,
                    "width": IMG_SIZE,
                    "instances": inst,
                }
            )
        return out

    from detectron2.utils.events import EventStorage

    opt = torch.optim.SGD(model.parameters(), lr=spec["lr"], momentum=0.9)
    model.train()
    order = np.arange(N_TRAIN_IMAGES)
    step_rng = np.random.RandomState(99)
    with EventStorage():
        for it in range(spec["iters"]):
            idx = step_rng.choice(order, size=4, replace=False)
            losses = model(to_inputs(idx))
            loss = sum(losses.values())
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
            if it % 50 == 0:
                print(f"ref train it {it}: {float(loss):.3f}")

    model.eval()
    rec = {}
    with torch.no_grad():
        for i in range(N_TRAIN_IMAGES):
            out = model(
                [
                    {
                        "image": torch.from_numpy(images[i]),
                        "height": IMG_SIZE,
                        "width": IMG_SIZE,
                    }
                ]
            )[0]["instances"]
            rec[f"pred_boxes{i}"] = out.pred_boxes.tensor.numpy()
            rec[f"pred_scores{i}"] = out.scores.numpy()
            rec[f"pred_classes{i}"] = out.pred_classes.numpy()
            if out.has("pred_masks"):
                rec[f"pred_masks{i}"] = out.pred_masks.numpy().astype(np.uint8)

    for i in range(N_TRAIN_IMAGES):
        rec[f"image{i}"] = images[i]
        rec[f"gt_boxes{i}"] = np.asarray([a["bbox"] for a in gts[i]], np.float32)
        rec[f"gt_classes{i}"] = np.asarray(
            [a["category_id"] for a in gts[i]], np.int64
        )
        rec[f"gt_masks{i}"] = np.stack([a["mask"] for a in gts[i]]).astype(np.uint8)
    for k, v in model.state_dict().items():
        if "num_batches" not in k and "cell_anchors" not in k:
            rec["sd." + k] = v.detach().numpy().copy()
    return rec
