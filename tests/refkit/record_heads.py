"""Reference recordings for the non-R-CNN head families
(tests/test_head_parity.py): RetinaNet (dense towers, decode+NMS, focal
losses), keypoint heatmap decode, panoptic fusion.

* retinanet — builds the reference RetinaNet
  (configs/COCO-Detection/retinanet_R_50_FPN_1x.yaml) on CPU with seeded
  random weights (cls head boosted for decisive rank ordering), records the
  per-level head towers, the decoded+NMS'd detections, AND the train-mode
  loss dict on a fixed GT batch. ``loss_normalizer_momentum`` is zeroed for
  the loss recording: the reference EMAs its focal normalizer across steps
  (retinanet.py:315-317), which a stateless jitted step deliberately does
  not reproduce (documented deviation) — with momentum 0 both sides
  normalize by max(num_pos, 1), so the loss FORMULAS are pinned exactly.
* kp_decode — structures/keypoints.py:143 ``heatmaps_to_keypoints`` on
  seeded random heatmaps/rois (per-ROI dynamic bicubic upsample + argmax).
* panoptic_fusion — meta_arch/panoptic_fpn.py:133
  ``combine_semantic_and_instance_outputs`` on a seeded synthetic set of
  overlapping instance masks + a stuff map.
"""

import os

import numpy as np

VERSION = "h1"
CACHE_DIR = os.environ.get("JTSM_REFCASE_CACHE", "/tmp/jtsm_refcases")

RETINA_SIZE = 320
RETINA_B = 2


def _cached(name, fn):
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"{name}_{VERSION}.npz")
    if os.path.exists(path):
        return dict(np.load(path, allow_pickle=True))
    rec = fn()
    np.savez_compressed(path, **rec)
    return rec


def get_retinanet_case():
    return _cached("retinanet", _record_retinanet)


def get_kp_decode_case():
    return _cached("kp_decode", _record_kp_decode)


def get_panoptic_fusion_case():
    return _cached("panoptic_fusion", _record_panoptic_fusion)


def _record_retinanet() -> dict:
    from . import import_reference

    import_reference()
    import torch
    from detectron2.config import get_cfg as ref_get_cfg
    from detectron2.modeling import build_model as ref_build_model
    from detectron2.structures import Boxes, Instances
    from detectron2.utils.events import EventStorage

    cfg = ref_get_cfg()
    cfg.merge_from_file("/root/reference/configs/COCO-Detection/retinanet_R_50_FPN_1x.yaml")
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.WEIGHTS = ""
    torch.manual_seed(31)
    model = ref_build_model(cfg)
    model.eval()

    g = torch.Generator().manual_seed(55)
    with torch.no_grad():
        for _, p in model.named_parameters():
            if p.ndim >= 2:
                p.normal_(0, 0.02, generator=g)
            else:
                p.normal_(0, 0.01, generator=g)
        for name, bmm in model.named_buffers():
            if name.endswith("running_mean"):
                bmm.normal_(0, 0.5, generator=g)
            elif name.endswith("running_var"):
                bmm.uniform_(0.5, 2.0, generator=g)
            elif name.endswith("weight"):
                bmm.uniform_(0.7, 1.3, generator=g)
            elif name.endswith("bias"):
                bmm.normal_(0, 0.2, generator=g)
        model.head.cls_score.weight.mul_(8.0)

    rng = np.random.RandomState(13)
    s = RETINA_SIZE
    imgs_np = [
        rng.randint(0, 255, (3, s, s)).astype("float32") for _ in range(RETINA_B)
    ]
    rec = {}

    # ---- inference tensors
    inputs = [{"image": torch.from_numpy(im), "height": s, "width": s} for im in imgs_np]
    with torch.no_grad():
        images = model.preprocess_image(inputs)
        features = model.backbone(images.tensor)
        feats = [features[f] for f in model.head_in_features]
        logits, deltas = model.head(feats)
        for li, (lg, dl) in enumerate(zip(logits, deltas)):
            rec[f"logits_l{li}"] = lg.numpy()
            rec[f"deltas_l{li}"] = dl.numpy()
        for li, f in enumerate(feats):
            rec[f"feat_l{li}"] = f.numpy()
        outs = model(inputs)
    for i, out in enumerate(outs):
        inst = out["instances"]
        rec[f"boxes{i}"] = inst.pred_boxes.tensor.numpy()
        rec[f"scores{i}"] = inst.scores.numpy()
        rec[f"classes{i}"] = inst.pred_classes.numpy()

    # ---- train losses on fixed GT (anchor matching is deterministic)
    gt = [
        np.asarray([[30, 40, 140, 160], [180, 60, 290, 200]], np.float32),
        np.asarray([[50, 180, 200, 300]], np.float32),
    ]
    gt_cls = [np.asarray([7, 33], np.int64), np.asarray([55], np.int64)]
    train_inputs = []
    for i in range(RETINA_B):
        inst = Instances((s, s))
        inst.gt_boxes = Boxes(torch.from_numpy(gt[i]))
        inst.gt_classes = torch.from_numpy(gt_cls[i])
        train_inputs.append(
            {"image": torch.from_numpy(imgs_np[i]), "height": s, "width": s, "instances": inst}
        )
    model.train()
    model.loss_normalizer_momentum = 0.0  # see module docstring
    with EventStorage(0), torch.no_grad():
        losses = model(train_inputs)
    for name, val in losses.items():
        rec[f"loss.{name}"] = np.asarray(float(val), np.float64)
    for i in range(RETINA_B):
        rec[f"image{i}"] = imgs_np[i]
        rec[f"gt_boxes{i}"] = gt[i]
        rec[f"gt_classes{i}"] = gt_cls[i]
    for k, v in model.state_dict().items():
        if "num_batches" not in k and "cell_anchors" not in k:
            rec["sd." + k] = v.detach().numpy().copy()
    return rec


def _record_kp_decode() -> dict:
    from . import import_reference

    import_reference()
    import torch
    from detectron2.structures.keypoints import heatmaps_to_keypoints

    rng = np.random.RandomState(3)
    n, k, hm = 12, 17, 56
    maps = rng.randn(n, k, hm, hm).astype(np.float32)
    # one DECISIVE spike per (roi, kp): trained heatmap peaks dominate their
    # surroundings; near-tied noise peaks would make the reference's bicubic
    # upsample flip argmaxes on interpolation overshoot, which is test-data
    # fragility rather than decode semantics
    for i in range(n):
        for j in range(k):
            yy, xx = rng.randint(4, hm - 4, 2)
            maps[i, j, yy, xx] += 12.0
    rois = np.zeros((n, 4), np.float32)
    x0 = rng.uniform(0, 180, n)
    y0 = rng.uniform(0, 180, n)
    rois[:, 0] = x0
    rois[:, 1] = y0
    rois[:, 2] = x0 + rng.uniform(40, 130, n)
    rois[:, 3] = y0 + rng.uniform(40, 130, n)
    out = heatmaps_to_keypoints(torch.from_numpy(maps), torch.from_numpy(rois))
    return {"maps": maps, "rois": rois, "keypoints": out.numpy()}


def _record_panoptic_fusion() -> dict:
    from . import import_reference

    import_reference()
    import torch
    from detectron2.modeling.meta_arch.panoptic_fpn import (
        combine_semantic_and_instance_outputs,
    )
    from detectron2.structures import Instances

    rng = np.random.RandomState(11)
    h = w = 160
    d = 10
    masks = np.zeros((d, h, w), bool)
    scores = rng.uniform(0.2, 1.0, d).astype(np.float32)
    scores += np.linspace(0, 1e-3, d).astype(np.float32)  # break ties
    classes = rng.randint(0, 80, d)
    for i in range(d):
        x0, y0 = rng.randint(0, w - 40), rng.randint(0, h - 40)
        ww, hh = rng.randint(25, 70), rng.randint(25, 70)
        masks[i, y0 : y0 + hh, x0 : x0 + ww] = True
    sem = np.zeros((h, w), np.int64)
    sem[:70] = 3  # big stuff region
    sem[120:, :50] = 5  # small region (area-limited)
    sem[100:, 90:] = 7

    inst = Instances((h, w))
    inst.pred_masks = torch.from_numpy(masks)
    inst.scores = torch.from_numpy(scores)
    inst.pred_classes = torch.from_numpy(classes)
    pan, infos = combine_semantic_and_instance_outputs(
        inst,
        torch.from_numpy(sem),
        overlap_threshold=0.5,
        stuff_area_limit=1500,
        instances_confidence_threshold=0.45,
    )
    rec = {
        "masks": masks,
        "scores": scores,
        "classes": classes.astype(np.int64),
        "sem": sem.astype(np.int32),
        "panoptic": pan.numpy().astype(np.int32),
        "n_segments": np.asarray(len(infos)),
    }
    for i, info in enumerate(infos):
        rec[f"seg{i}_id"] = np.asarray(info["id"])
        rec[f"seg{i}_isthing"] = np.asarray(int(info["isthing"]))
        rec[f"seg{i}_category"] = np.asarray(info["category_id"])
    return rec
