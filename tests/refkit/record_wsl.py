"""Run the REFERENCE WSL/JTSM torch heads on CPU and record stage-by-stage
tensors for the WSL model-parity tests (tests/test_wsl_model_parity.py).

Scope: the JTSM ``_forward_box`` training path
(projects/WSL/wsl/modeling/roi_heads/roi_heads_jtsm.py:589-737) driven on
a JTSMROIHeads built from the fork's flagship config
(configs/PascalVOC-PanopticSegmentation/jtsm_WSR_18_DC5_1x.yaml, heads
shrunk), covering
* MOIPool pooling + mask-area rescale + objectness feature scaling
  (:608-633),
* the DAN box head (box_head.py:19),
* TSM MIL scoring softmax_cls x softmax_det and the image-level BCE
  (fast_rcnn_tsm.py:573-586, :346),
* the K OICR refinement steps: get_pgt_top_k mining (:1168, with
  pred_class_img_logits weights), label_and_sample matching, and the
  weighted CE + smooth_l1_weighted loss dict (fast_rcnn_oicr.py:243-380).

Recording notes:
* oh_labels are ALL-ONES: the reference's CPU MOIPool kernel ignores the
  superpixel arguments entirely (MOIPool_cpu.cpp:13 is plain Caffe RoIPool;
  only MOIPool_cuda.cu masks), so full membership is the one configuration
  where the CPU reference and the masked semantics coincide. The masked
  behavior itself stays pinned against a transcription of the CUDA kernel
  in tests/test_wsl_parity.py::test_moi_pool_exact_parity.
* DAN dropout is forced to p=0 (deterministic; parity is about the
  math, not torch's RNG stream).
* binary_mask_to_polygon2 (needs skimage, absent) is patched to a dummy
  triangle: it only feeds gt_masks polygons no recorded path consumes.
  get_pgt_sem_seg still runs its REAL GrabCut evidence pipeline and its
  painted pgt_sem_seg is recorded (structural reference for the repo's
  redesigned superpixel-evidence miner).
"""

import os

import numpy as np

VERSION = "w1"
CACHE_DIR = os.environ.get("JTSM_REFCASE_CACHE", "/tmp/jtsm_refcases")

B = 2
IMG = 128
FEAT_C = 64
STRIDE = 8
R = 48  # proposals per image
N_SP = 16  # superpixels per image (4x4 grid)
DAN_DIM = 128
NUM_THINGS = 20
NUM_STUFF = 2  # TwoClassHead: class 0 = things


def get_wsl_case() -> dict:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"jtsm_head_{VERSION}.npz")
    if os.path.exists(path):
        return dict(np.load(path))
    rec = _record()
    np.savez_compressed(path, **rec)
    return rec


def _build_head():
    from . import import_reference_wsl

    import_reference_wsl()
    import torch
    from detectron2.config import get_cfg as ref_get_cfg
    from detectron2.layers import ShapeSpec
    from detectron2.modeling import build_roi_heads
    from wsl.config import add_wsl_config
    from wsl.modeling.roi_heads import roi_heads_jtsm

    # polygon conversion needs skimage; its output feeds only gt_masks
    # polygons, which no recorded quantity consumes
    roi_heads_jtsm.binary_mask_to_polygon2 = lambda mask, box: [
        np.asarray([1.0, 1.0, 5.0, 1.0, 5.0, 5.0])
    ]

    cfg = ref_get_cfg()
    add_wsl_config(cfg)
    cfg.merge_from_file(
        "/root/reference/projects/WSL/configs/PascalVOC-PanopticSegmentation/"
        "jtsm_WSR_18_DC5_1x.yaml"
    )
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.MASK_ON = False  # scope: _forward_box (mask branch is grabcut)
    cfg.VIS_PERIOD = 0
    cfg.WSL.VIS_TEST = False
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [DAN_DIM, DAN_DIM]
    cfg.OUTPUT_DIR = "/tmp/jtsm_refcase_wsl_out"

    torch.manual_seed(23)
    shape = {"res5": ShapeSpec(channels=FEAT_C, stride=STRIDE)}
    head = build_roi_heads(cfg, shape)
    head.train()
    for m in head.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    g = torch.Generator().manual_seed(71)
    with torch.no_grad():
        for _, p in head.named_parameters():
            if p.ndim >= 2:
                p.normal_(0, 0.02, generator=g)
            else:
                p.normal_(0, 0.01, generator=g)
        # decisive score gaps for rank-for-rank mining comparisons
        head.box_predictor.cls.weight.mul_(8.0)
        head.box_predictor.det.weight.mul_(8.0)
        for k in range(head.refine_K):
            head.box_refinery[k].cls_score.weight.mul_(8.0)
    return cfg, head


def _inputs():
    import torch
    from detectron2.structures import Boxes, ImageList, Instances

    rng = np.random.RandomState(9)
    images_np = rng.randint(0, 255, (B, 3, IMG, IMG)).astype("float32") - 110.0
    images = ImageList(torch.from_numpy(images_np), [(IMG, IMG)] * B)

    feats_np = rng.randn(B, FEAT_C, IMG // STRIDE, IMG // STRIDE).astype("float32")
    features = {"res5": torch.from_numpy(feats_np)}

    # 4x4 superpixel grid; oh_labels all-ones (see module docstring)
    cell = IMG // 4
    sp_np = np.zeros((B, IMG, IMG), np.int64)
    for gy in range(4):
        for gx in range(4):
            sp_np[:, gy * cell : (gy + 1) * cell, gx * cell : (gx + 1) * cell] = (
                gy * 4 + gx
            )
    superpixels = ImageList(torch.from_numpy(sp_np), [(IMG, IMG)] * B)
    oh_np = np.ones((B, R, N_SP), np.uint8)

    boxes_np = np.zeros((B, R, 4), np.float32)
    x0 = rng.uniform(0, IMG - 24, (B, R))
    y0 = rng.uniform(0, IMG - 24, (B, R))
    w = rng.uniform(12, IMG / 2, (B, R))
    h = rng.uniform(12, IMG / 2, (B, R))
    boxes_np[..., 0] = x0
    boxes_np[..., 1] = y0
    boxes_np[..., 2] = np.minimum(x0 + w, IMG - 1)
    boxes_np[..., 3] = np.minimum(y0 + h, IMG - 1)
    obj_np = rng.uniform(0, 1, (B, R)).astype(np.float32)

    proposals = []
    for i in range(B):
        inst = Instances((IMG, IMG))
        inst.proposal_boxes = Boxes(torch.from_numpy(boxes_np[i]))
        inst.objectness_logits = torch.from_numpy(obj_np[i])
        inst.oh_labels = torch.from_numpy(oh_np[i])
        proposals.append(inst)

    # image-level targets: 2-3 thing classes per image (disjoint across the
    # two images so per-image label paths are distinguishable)
    gt_classes = [np.asarray([2, 7, 11], np.int64), np.asarray([4, 15], np.int64)]
    targets = []
    for i in range(B):
        inst = Instances((IMG, IMG))
        n = len(gt_classes[i])
        gb = boxes_np[i, :n].copy()
        inst.gt_boxes = Boxes(torch.from_numpy(gb))
        inst.gt_classes = torch.from_numpy(gt_classes[i])
        targets.append(inst)

    # stuff: band of stuff-class 1 over the top third, ignore strip at the
    # bottom; image 1 carries no stuff so the stuff-label path branches
    sem_np = np.zeros((B, IMG, IMG), np.int64)
    sem_np[0, : IMG // 3] = 1
    sem_np[0, -8:] = 255
    gt_sem_seg = torch.from_numpy(sem_np)

    return dict(
        images=images,
        features=features,
        superpixels=superpixels,
        proposals=proposals,
        targets=targets,
        gt_sem_seg=gt_sem_seg,
        arrays=dict(
            image=images_np,
            feat=feats_np,
            superpixels=sp_np.astype(np.int32),
            oh_labels=oh_np,
            prop_boxes=boxes_np,
            prop_obj=obj_np,
            sem_seg=sem_np.astype(np.int32),
            gt_classes0=gt_classes[0],
            gt_classes1=gt_classes[1],
        ),
    )


def _record() -> dict:
    cfg, head = _build_head()  # installs stubs + sys.path first

    import torch
    from detectron2.utils.events import EventStorage
    from wsl.modeling.roi_heads.roi_heads_jtsm import (
        get_image_level_gt,
        get_image_level_gt_stuff,
    )
    inp = _inputs()
    rec = {}
    for k, v in inp["arrays"].items():
        rec[k] = v

    # ---- capture module boundaries with forward hooks
    stages = {}

    def hook(name):
        def f(mod, args, out):
            stages.setdefault(name, []).append((args, out))

        return f

    head.box_head.register_forward_hook(hook("box_head"))
    head.box_predictor.register_forward_hook(hook("box_predictor"))
    for k in range(head.refine_K):
        head.box_refinery[k].register_forward_hook(hook(f"refine{k}"))

    orig_pool = head.box_pooler.forward

    def pool_wrap(*a, **kw):
        out = orig_pool(*a, **kw)
        stages.setdefault("pooler", []).append(out)
        return out

    head.box_pooler.forward = pool_wrap

    mined = []
    orig_mine = head.get_pgt_top_k

    def mine_wrap(*a, **kw):
        out = orig_mine(*a, **kw)
        if kw.get("need_instance", True):
            mined.append((kw.get("suffix", ""), out))
        return out

    head.get_pgt_top_k = mine_wrap

    labeled = []
    orig_label = head.label_and_sample_proposals

    def label_wrap(proposals, targets, suffix=""):
        out = orig_label(proposals, targets, suffix=suffix)
        labeled.append((suffix, out))
        return out

    head.label_and_sample_proposals = label_wrap

    # ---- the reference forward preamble (roi_heads_jtsm.forward :505-541)
    # replicated so _forward_box is driven exactly as in training
    images, features, proposals, targets = (
        inp["images"],
        inp["features"],
        inp["proposals"],
        inp["targets"],
    )
    superpixels, gt_sem_seg = inp["superpixels"], inp["gt_sem_seg"]

    with EventStorage(0), torch.no_grad():
        head.proposals = proposals
        head.superpixels = superpixels
        head.cnt_superpixels = [
            torch.bincount(sp.reshape(-1), minlength=p.oh_labels.size(1))
            .unsqueeze(0)
            .unsqueeze(0)
            for sp, p in zip(superpixels, proposals)
        ]
        (
            head.gt_classes_img,
            head.gt_classes_img_int,
            head.gt_classes_img_oh,
        ) = get_image_level_gt(targets, head.num_classes)
        (
            head.gt_classes_img_stuff,
            head.gt_classes_img_int_stuff,
            head.gt_classes_img_oh_stuff,
        ) = get_image_level_gt_stuff(gt_sem_seg, head.num_classes_stuff, head.num_classes)
        head.images = images
        sampled = head.label_and_sample_proposals(proposals, targets)
        losses = head._forward_box(features, sampled)

    # ---- flatten the captures
    rec["gt_img_oh"] = head.gt_classes_img_oh.numpy()
    rec["gt_img_oh_stuff"] = head.gt_classes_img_oh_stuff.numpy()
    for i, p in enumerate(sampled):
        rec[f"sampled_boxes{i}"] = p.proposal_boxes.tensor.numpy()
        rec[f"sampled_obj{i}"] = p.objectness_logits.numpy()
        rec[f"sampled_gt_classes{i}"] = p.gt_classes.numpy()

    pooled, argmax = stages["pooler"][0]
    rec["pooled"] = pooled.numpy()
    rec["pool_argmax"] = argmax.numpy()

    (bh_args, bh_out) = stages["box_head"][0]
    rec["box_features_in"] = bh_args[0].numpy()  # after mask/objectness scaling
    rec["box_features"] = bh_out.numpy()

    (bp_args, bp_out) = stages["box_predictor"][0]
    rec["mil_scores"] = bp_out[0].numpy()
    rec["pred_class_img_logits"] = head.pred_class_img_logits.numpy()

    for k in range(head.refine_K):
        (rk_args, rk_out) = stages[f"refine{k}"][0]
        rec[f"refine{k}_logits"] = rk_out[0].numpy()
        rec[f"refine{k}_deltas"] = rk_out[1].numpy()

    # mined targets per refinement branch (suffix _r{k}) and per image
    for suffix, targets_k in mined:
        if not suffix.startswith("_r") and suffix != "_sem_seg":
            continue
        tag = "semseg" if suffix == "_sem_seg" else f"pgt{suffix[2:]}"
        for i, t in enumerate(targets_k):
            rec[f"{tag}_boxes{i}"] = t.gt_boxes.tensor.numpy()
            rec[f"{tag}_classes{i}"] = t.gt_classes.numpy()
            rec[f"{tag}_scores{i}"] = t.gt_scores.numpy()
            rec[f"{tag}_weights{i}"] = t.gt_weights.numpy()

    # matched per-proposal supervision per branch
    for suffix, props_k in labeled:
        if not suffix.startswith("_r"):
            continue
        k = suffix[2:]
        for i, p in enumerate(props_k):
            rec[f"match{k}_gt_classes{i}"] = p.gt_classes.numpy()
            rec[f"match{k}_gt_weights{i}"] = p.gt_weights.numpy()
            rec[f"match{k}_gt_boxes{i}"] = p.gt_boxes.tensor.numpy()

    rec["pgt_sem_seg"] = head.pgt_sem_seg.numpy().astype(np.int32)

    for name, val in losses.items():
        rec[f"loss.{name}"] = np.asarray(float(val), np.float64)

    # head weights for the converter
    for k, v in head.state_dict().items():
        rec["sd." + k] = v.detach().numpy().copy()
    return rec


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    rec = get_wsl_case()
    for k in sorted(rec):
        v = rec[k]
        if k.startswith("loss."):
            print(k, float(v))
        elif not k.startswith("sd."):
            print(k, getattr(v, "shape", v))
