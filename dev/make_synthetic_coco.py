"""Fabricate a tiny synthetic COCO-format dataset tree so the
quick_schedules configs (coco_2017_val_100 & friends) run offline —
random images, boxes, polygon masks, keypoints, and panoptic/stuff PNGs
in the exact layout `jtsm_tpu/data/datasets/builtin.py` expects.

Usage: python dev/make_synthetic_coco.py [--root datasets] [--num 8]
"""

import argparse
import json
import os

import numpy as np
from PIL import Image

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from jtsm_tpu.data.datasets.builtin_meta import COCO_CATEGORIES

_THING = [c for c in COCO_CATEGORIES if c["isthing"]]
COCO_80 = [c["id"] for c in _THING]  # the real 80 thing ids (1..90, gaps)
_STUFF = [c for c in COCO_CATEGORIES if not c["isthing"]]
STUFF_0 = _STUFF[0]["id"]  # dataset id of stuff contiguous id 1
STUFF_1 = _STUFF[1]["id"]  # dataset id of stuff contiguous id 2


def make_images(img_dir, n, rng):
    os.makedirs(img_dir, exist_ok=True)
    infos = []
    for i in range(n):
        h = int(rng.integers(240, 321))
        w = int(rng.integers(320, 401))
        name = f"{i:012d}.jpg"
        infos.append({"id": i, "file_name": name, "height": h, "width": w})
    return infos


def class_color(cat_id):
    """Deterministic saturated color per category id, distinct from the
    gray stuff background — gives the synthetic scenes learnable appearance
    (supervised models memorize noise, but the weakly-supervised gates need
    image evidence MIL can localize)."""
    r = (37 * cat_id + 61) % 200 + 55
    g = (91 * cat_id + 13) % 200 + 55
    b = (53 * cat_id + 137) % 200 + 55
    return np.asarray([r, g, b], np.uint8)


STUFF_A_COLOR = np.asarray([95, 115, 205], np.uint8)  # "sky"-like band
STUFF_B_COLOR = np.asarray([95, 175, 95], np.uint8)  # "ground"-like band


def stuff_split_row(info, varied=False):
    """Row splitting the two textured stuff bands — large stuff regions with
    distinct appearance so mined STUFF supervision, not thing detections,
    drives the sem-seg and PQ_st pins of the weakly-supervised gates.

    Default (shared coco tree): a fixed 50%-height split in EVERY image.
    The split must not vary continuously per image: an id-dependent split
    turns the band boundary into a global image-identity cue, and on an
    8-image set the MIL image classifier can fit the labels from that cue
    alone — localization gradients vanish, pseudo-gt mining collapses to
    arbitrary boxes, and the weakly-supervised gate scores AP 0 (observed
    when the split was ``0.45 + 0.1 * f(id)``).

    ``varied`` (the cocovar tree for the JTSM stuff plane): band PRESENCE
    varies — id%3 cycles both / A-only / B-only — so the image-level stuff
    labels carry localization signal for ``get_pgt_sem_seg`` mining
    (reference roi_heads_jtsm.py:2025). split == h means no band B,
    split == 0 means no band A; the three discrete layouts avoid the
    continuous identity cue above."""
    h = info["height"]
    if varied:
        pat = info["id"] % 3
        if pat == 1:
            return h  # band A only
        if pat == 2:
            return 0  # band B only
    return int(h * 0.5)


def paint_stuff(img, info, varied=False):
    h, w = info["height"], info["width"]
    split = stuff_split_row(info, varied)
    img[:split] = STUFF_A_COLOR
    # horizontal stripe texture on band A
    img[0:split:6] = np.clip(STUFF_A_COLOR.astype(np.int16) - 35, 0, 255)
    img[split:] = STUFF_B_COLOR
    # checker texture on band B
    yy, xx = np.mgrid[split:h, 0:w]
    img[split:][((yy - split) // 8 + xx // 8)[: h - split] % 2 == 0] = np.clip(
        STUFF_B_COLOR.astype(np.int16) + 30, 0, 255
    )
    return split


def render_images(img_dir, infos, anns_by_image, rng, varied=False):
    """Paint each scene: textured stuff bands + per-class colored thing
    rects (instances order = paint order, matching the panoptic id maps),
    plus mild pixel noise so features are not constant."""
    for info in infos:
        h, w = info["height"], info["width"]
        img = np.zeros((h, w, 3), np.uint8)
        paint_stuff(img, info, varied)
        for a in anns_by_image.get(info["id"], []):
            x, y, bw, bh = (int(round(v)) for v in a["bbox"])
            img[y : y + bh, x : x + bw] = class_color(int(a["category_id"]))
        noise = rng.integers(-12, 13, (h, w, 3))
        img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, info["file_name"]))


def rect_poly(x, y, bw, bh):
    return [[x, y, x + bw, y, x + bw, y + bh, x, y + bh]]


def make_instances(infos, rng, with_kpts=False):
    anns = []
    aid = 1
    for info in infos:
        for _ in range(int(rng.integers(1, 5))):
            bw = float(rng.uniform(20, info["width"] / 2))
            bh = float(rng.uniform(20, info["height"] / 2))
            x = float(rng.uniform(0, info["width"] - bw - 1))
            y = float(rng.uniform(0, info["height"] - bh - 1))
            ann = {
                "id": aid,
                "image_id": info["id"],
                "category_id": 1 if with_kpts else int(rng.choice(COCO_80)),
                "bbox": [x, y, bw, bh],
                "area": bw * bh,
                "iscrowd": 0,
                "segmentation": rect_poly(x, y, bw, bh),
            }
            if with_kpts:
                # deterministic per-index fractional positions (a 5x4 grid
                # over the box) so the keypoint head has a LEARNABLE target
                # ("keypoint k sits at a fixed relative offset of the box")
                # and the synthetic keypoint gate can assert a real OKS AP
                kps = []
                for k in range(17):
                    fx = 0.15 + 0.7 * (k % 5) / 4.0
                    fy = 0.15 + 0.7 * (k // 5) / 3.0
                    kps += [x + fx * bw, y + fy * bh, 2]
                ann["keypoints"] = kps
                ann["num_keypoints"] = 17
            anns.append(ann)
            aid += 1
    return anns


def categories(with_kpts=False):
    if with_kpts:
        from jtsm_tpu.data.datasets.builtin_meta import COCO_PERSON_KEYPOINT_NAMES

        return [
            {
                "id": 1,
                "name": "person",
                "keypoints": list(COCO_PERSON_KEYPOINT_NAMES),
                "skeleton": [],
            }
        ]
    return [{"id": c["id"], "name": c["name"]} for c in _THING]


def build_tree(root, subdir="coco", num=8, varied=False, full=True):
    """Write one synthetic tree. ``full`` adds the keypoint/densepose jsons
    (only the shared coco tree needs them); ``varied`` cycles the stuff-band
    layout per image (the cocovar tree for the JTSM stuff plane — see
    stuff_split_row)."""
    rng = np.random.default_rng(0 if not varied else 7)
    coco = os.path.join(root, subdir)
    ann_dir = os.path.join(coco, "annotations")
    os.makedirs(ann_dir, exist_ok=True)

    infos = make_images(os.path.join(coco, "val2017"), num, rng)

    # instances_val2017_100.json
    inst = {
        "images": infos,
        "annotations": make_instances(infos, rng),
        "categories": categories(),
    }
    with open(os.path.join(ann_dir, "instances_val2017_100.json"), "w") as f:
        json.dump(inst, f)

    # render the scenes from the instance annotations (colored rects on the
    # gray stuff background — the weak-supervision gates need localizable
    # appearance, not pure noise)
    _abi = {}
    for a in inst["annotations"]:
        _abi.setdefault(a["image_id"], []).append(a)
    render_images(os.path.join(coco, "val2017"), infos, _abi, rng, varied)

    if full:
        _write_person_jsons(inst, infos, ann_dir)

    # panoptic: id map PNGs + stuff sem-seg PNGs. Thing segments are painted
    # FROM THE INSTANCES ANNOTATIONS so box/mask GT and panoptic GT agree
    # (the panoptic gates then measure one consistent scene).
    _write_panoptic_and_proposals(coco, ann_dir, inst, infos, varied)
    print(f"synthetic COCO written under {coco} ({num} images)")


def _write_person_jsons(inst, infos, ann_dir):
    # person_keypoints_val2017_100.json — keypoint annotations DERIVE from
    # the instance boxes (the rects actually painted in the images), so the
    # keypoint gate measures localization of visible evidence; every rect is
    # a "person" with the deterministic 5x4 keypoint grid
    kp_anns = []
    for a in inst["annotations"]:
        x, y, bw, bh = a["bbox"]
        kps = []
        for k in range(17):
            fx = 0.15 + 0.7 * (k % 5) / 4.0
            fy = 0.15 + 0.7 * (k // 5) / 3.0
            kps += [x + fx * bw, y + fy * bh, 2]
        kp_anns.append(
            dict(a, category_id=1, keypoints=kps, num_keypoints=17)
        )
    kp = {
        "images": infos,
        "annotations": kp_anns,
        "categories": categories(with_kpts=True),
    }
    with open(os.path.join(ann_dir, "person_keypoints_val2017_100.json"), "w") as f:
        json.dump(kp, f)

    # densepose_synth_100.json — every rect is a "person" whose dense
    # surface labels DERIVE from position within the box: a 6x4 part grid
    # (24 parts, the COCO-DensePose chart count) with U/V = the fractional
    # box coordinates. Like the keypoint grid, this gives the IUV head a
    # LEARNABLE target (relative position within the visible rect), so the
    # DensePose gate asserts real GPS/GPSm numbers. dp_masks carries the
    # full-foreground chart (rects are fully foreground), exercising the
    # reference getDensePoseMask path in GPSm.
    from jtsm_tpu.data.rle import rle_string_encode as _rle_enc

    full_mask_rle = _rle_enc(np.ones((256, 256), bool))
    dp_anns = []
    for a in inst["annotations"]:
        dp_x, dp_y, dp_i, dp_u, dp_v = [], [], [], [], []
        for k in range(24):
            c, r = k % 6, k // 6
            fx = (c + 0.5) / 6.0
            fy = (r + 0.5) / 4.0
            dp_x.append(fx * 255.0)
            dp_y.append(fy * 255.0)
            dp_i.append(k + 1)
            dp_u.append(fx)
            dp_v.append(fy)
        dp_anns.append(
            dict(
                a,
                category_id=1,
                dp_x=dp_x,
                dp_y=dp_y,
                dp_I=dp_i,
                dp_U=dp_u,
                dp_V=dp_v,
                dp_masks=[full_mask_rle] + [None] * 13,
            )
        )
    with open(os.path.join(ann_dir, "densepose_synth_100.json"), "w") as f:
        json.dump(
            {
                "images": infos,
                "annotations": dp_anns,
                "categories": [{"id": 1, "name": "person"}],
            },
            f,
        )


def _write_panoptic_and_proposals(coco, ann_dir, inst, infos, varied=False):
    anns_by_image = {}
    for a in inst["annotations"]:
        anns_by_image.setdefault(a["image_id"], []).append(a)
    pan_dir = os.path.join(coco, "panoptic_val2017_100")
    stuff_dir = os.path.join(coco, "panoptic_stuff_val2017_100")
    os.makedirs(pan_dir, exist_ok=True)
    os.makedirs(stuff_dir, exist_ok=True)
    pan_anns = []
    for info in infos:
        h, w = info["height"], info["width"]
        seg_id = 1
        ids = np.zeros((h, w), np.uint32)
        segments = []
        # textured stuff bands (matching paint_stuff), then instances
        split = stuff_split_row(info, varied)
        ids[:split] = 1
        ids[split:] = 2
        segments.append(
            {"id": 1, "category_id": STUFF_0, "iscrowd": 0, "area": int(split * w)}
        )
        segments.append(
            {"id": 2, "category_id": STUFF_1, "iscrowd": 0, "area": int((h - split) * w)}
        )
        seg_id = 3
        for a in anns_by_image.get(info["id"], []):
            x, y, bw, bh = (int(round(v)) for v in a["bbox"])
            ids[y : y + bh, x : x + bw] = seg_id
            segments.append(
                {
                    "id": seg_id,
                    "category_id": int(a["category_id"]),
                    "iscrowd": 0,
                    "area": int(bw * bh),
                }
            )
            seg_id += 1
        # visible areas after overlaps
        areas = np.bincount(ids.reshape(-1), minlength=seg_id)
        segments = [
            dict(s, area=int(areas[s["id"]])) for s in segments if areas[s["id"]] > 0
        ]
        rgb = np.stack(
            [ids % 256, (ids // 256) % 256, ids // 256**2], -1
        ).astype(np.uint8)
        png = info["file_name"].replace(".jpg", ".png")
        Image.fromarray(rgb).save(os.path.join(pan_dir, png))
        # stuff sem-seg (separated-format convention): thing pixels = 0,
        # stuff bands = their contiguous ids (1, 2)
        sem = np.where(ids == 1, 1, np.where(ids == 2, 2, 0)).astype(np.uint8)
        Image.fromarray(sem).save(os.path.join(stuff_dir, png))
        pan_anns.append(
            {
                "image_id": info["id"],
                "file_name": png,
                "segments_info": segments,
            }
        )
    with open(os.path.join(ann_dir, "panoptic_val2017_100.json"), "w") as f:
        json.dump(
            {
                "images": infos,
                "annotations": pan_anns,
                "categories": [
                    {"id": c["id"], "name": c["name"], "isthing": c["isthing"]}
                    for c in COCO_CATEGORIES
                ],
            },
            f,
        )
    # MCG-style segmentation proposals pickle for the WSL/JTSM plane:
    # per image, jittered copies of the GT rects + random distractors, a
    # superpixel label map in which every GT rect is an exact union of
    # superpixels (stuff grid + per-thing local grids, the property MCG
    # segments give the reference), and per-proposal one-hot membership.
    import pickle

    # own seeded stream: proposal jitter must not depend on how many draws
    # earlier sections consumed
    rng = np.random.default_rng(1)
    ids_list, boxes_list, logits_list, sp_list, oh_list = [], [], [], [], []
    cell = 24
    for info in infos:
        h, w = info["height"], info["width"]
        # background grid split at the stuff-band boundary so each band is
        # an exact union of superpixels (MCG superpixels follow appearance
        # boundaries; the stuff mining relies on that)
        split = stuff_split_row(info, varied)
        ncols = (w + cell - 1) // cell
        row_a = np.arange(h)[:, None] // cell
        row_b = (split + cell - 1) // cell + (np.arange(h)[:, None] - split) // cell
        row_idx = np.where(np.arange(h)[:, None] < split, row_a, row_b)
        sp = row_idx * ncols + (np.arange(w)[None, :] // cell)
        next_id = int(sp.max()) + 1
        gt = []
        for a in anns_by_image.get(info["id"], []):
            x, y, bw, bh = (int(round(v)) for v in a["bbox"])
            local = (np.arange(bh)[:, None] // cell) * (
                (bw + cell - 1) // cell
            ) + (np.arange(bw)[None, :] // cell)
            sp[y : y + bh, x : x + bw] = next_id + local
            next_id += int(local.max()) + 1
            gt.append([x, y, x + bw, y + bh])
        gt = np.asarray(gt, np.float32).reshape(-1, 4)
        # stuff-covering candidates: the full image + quadrants, so the MIL
        # stuff branch has background-dominant proposals to mine (real MCG
        # segment proposals cover stuff regions too)
        split = stuff_split_row(info, varied)
        stuff_boxes = np.asarray(
            [
                [0, 0, w - 1, h - 1],
                # the two stuff bands themselves (MCG segment proposals
                # cover real stuff regions; the mined stuff branch needs
                # candidates that isolate each band)
                [0, 0, w - 1, split - 1],
                [0, split, w - 1, h - 1],
                [0, 0, w // 2, h // 2],
                [w // 2, 0, w - 1, h // 2],
                [0, h // 2, w // 2, h - 1],
                [w // 2, h // 2, w - 1, h - 1],
            ],
            np.float32,
        )
        # degenerate band boxes drop out when a band is absent (varied tree)
        stuff_boxes = stuff_boxes[
            (stuff_boxes[:, 3] > stuff_boxes[:, 1])
            & (stuff_boxes[:, 2] > stuff_boxes[:, 0])
        ]
        jit = np.concatenate(
            [gt + rng.normal(0, 3, gt.shape) for _ in range(3)]
            + [gt, stuff_boxes],
            0,
        )
        n_rand = max(0, 64 - len(jit))
        rx1 = rng.uniform(0, w * 0.7, n_rand)
        ry1 = rng.uniform(0, h * 0.7, n_rand)
        rnd_boxes = np.stack(
            [
                rx1,
                ry1,
                rx1 + rng.uniform(16, w * 0.3, n_rand),
                ry1 + rng.uniform(16, h * 0.3, n_rand),
            ],
            1,
        )
        boxes = np.concatenate([jit, rnd_boxes], 0).astype(np.float32)
        boxes = np.clip(boxes, [0, 0, 0, 0], [w - 1, h - 1, w - 1, h - 1])
        logits = np.sort(rng.uniform(0, 1, len(boxes)))[::-1].astype(np.float32)
        # membership: superpixels whose centroid falls inside the box
        from jtsm_tpu.wsl.data import oh_labels_from_boxes

        oh = oh_labels_from_boxes(boxes, sp.astype(np.int32), next_id)
        ids_list.append(info["id"])
        boxes_list.append(boxes)
        logits_list.append(logits)
        sp_list.append(sp.astype(np.int32))
        oh_list.append(oh)
    with open(os.path.join(coco, "proposals_val2017_100.pkl"), "wb") as f:
        pickle.dump(
            {
                "ids": ids_list,
                "boxes": boxes_list,
                "objectness_logits": logits_list,
                "superpixels": sp_list,
                "oh_labels": oh_list,
                "bbox_mode": 0,  # BoxMode.XYXY_ABS
            },
            f,
        )

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.environ.get("JTSM_DATASETS", "datasets"))
    ap.add_argument("--num", type=int, default=8)
    ap.add_argument(
        "--num-varied",
        type=int,
        default=12,
        help="images in the varied-stuff cocovar tree (JTSM stuff plane)",
    )
    args = ap.parse_args()
    build_tree(args.root, "coco", args.num, varied=False, full=True)
    # cocovar: stuff-band presence varies per image so image-level stuff
    # labels carry localization signal for the JTSM sem-seg mining
    build_tree(args.root, "cocovar", args.num_varied, varied=True, full=False)


if __name__ == "__main__":
    main()
