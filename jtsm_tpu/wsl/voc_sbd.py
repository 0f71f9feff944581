"""VOC 2012 + SBD dataset conversion for the JTSM/WSL plane.

Library backing the `projects/WSL/tools/convert_voc2012_and_sbd_*.py` CLIs
(reference: projects/WSL/tools/convert_voc2012_and_sbd_instance.py,
convert_voc2012_and_sbd_panoptic.py, prepare_panoptic_fpn_voc2012_and_sbd.py).

JTSM trains weakly-supervised panoptic segmentation on PASCAL VOC 2012
augmented with SBD: 20 "thing" classes + 1 "background" stuff class. The
reference converts the VOC `SegmentationObject`/`SegmentationClass` palette
PNGs and SBD `inst`/`cls` .mat files into (a) COCO-style instance jsons with
polygon segmentations and (b) COCO-panoptic jsons + id-encoded PNGs, then
(c) separates stuff-only semantic PNGs for the PanopticFPN-style training.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from .data import VOC_CLASS_NAMES
from .evidence import binary_mask_to_polygon


def voc_colormap(n: int = 256) -> np.ndarray:
    """The standard VOC palette: bit-reversal colormap, (N, 3) uint8."""
    cmap = np.zeros((n, 3), dtype=np.uint8)
    for i in range(n):
        r = g = b = 0
        cid = i
        for j in range(8):
            r |= ((cid >> 0) & 1) << (7 - j)
            g |= ((cid >> 1) & 1) << (7 - j)
            b |= ((cid >> 2) & 1) << (7 - j)
            cid >>= 3
        cmap[i] = (r, g, b)
    return cmap


_CMAP = voc_colormap()

# 20 VOC things (ids 1..20) + background stuff (id 21), reference
# wsl/data/datasets/builtin_meta.py:186 (VOC_CATEGORIES)
VOC_CATEGORIES: List[Dict] = [
    {"id": i + 1, "name": name, "isthing": 1, "color": _CMAP[i + 1].tolist()}
    for i, name in enumerate(VOC_CLASS_NAMES)
] + [{"id": 21, "name": "background", "isthing": 0, "color": _CMAP[0].tolist()}]

BACKGROUND_CATEGORY_ID = 21


def read_split_ids(txt_path: str) -> List[str]:
    with open(txt_path) as f:
        return [ln.strip().split()[0] for ln in f if ln.strip()]


def load_voc_masks(inst_png: str, cls_png: str) -> Tuple[np.ndarray, np.ndarray]:
    """Palette PNGs -> (semantic, instance) uint8 index maps (255 = edge)."""
    instance = np.asarray(Image.open(inst_png), dtype=np.uint8)
    semantic = np.asarray(Image.open(cls_png), dtype=np.uint8)
    return semantic, instance


def load_sbd_masks(inst_mat: str, cls_mat: str) -> Tuple[np.ndarray, np.ndarray]:
    """SBD GTinst/GTcls .mat files -> (semantic, instance) uint8 maps."""
    from scipy.io import loadmat

    inst = loadmat(inst_mat)["GTinst"]["Segmentation"][0][0].astype(np.uint8)
    cls_ = loadmat(cls_mat)["GTcls"]["Segmentation"][0][0].astype(np.uint8)
    return cls_, inst


def load_masks_auto(
    name: str,
    voc_root: str,
    sbd_root: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Prefer SBD .mat (denser labels), fall back to VOC PNGs (reference
    convert_voc2012_and_sbd_instance.py:293-297 prefers SBD when present)."""
    if sbd_root:
        inst_mat = os.path.join(sbd_root, "inst", name + ".mat")
        cls_mat = os.path.join(sbd_root, "cls", name + ".mat")
        if os.path.isfile(inst_mat):
            return load_sbd_masks(inst_mat, cls_mat)
    return load_voc_masks(
        os.path.join(voc_root, "SegmentationObject", name + ".png"),
        os.path.join(voc_root, "SegmentationClass", name + ".png"),
    )


def _instance_entries(semantic: np.ndarray, instance: np.ndarray):
    """Yield (instance_id, category_id, binary_mask) for each real instance."""
    for inst_id in np.unique(instance):
        if inst_id in (0, 255):  # background / void edge
            continue
        mask = instance == inst_id
        labels = semantic[mask]
        labels = labels[(labels != 0) & (labels != 255)]
        if labels.size == 0:
            continue
        cat_id = int(np.bincount(labels).argmax())
        yield int(inst_id), cat_id, mask


def masks_to_instance_annotations(
    semantic: np.ndarray,
    instance: np.ndarray,
    image_id,
    start_ann_id: int,
    mode: str = "poly",
) -> List[Dict]:
    """One image's masks -> COCO instance annotation dicts (1-based VOC ids)."""
    from ..data.rle import rle_string_encode

    annos = []
    for _, cat_id, mask in _instance_entries(semantic, instance):
        ys, xs = np.nonzero(mask)
        x0, y0, x1, y1 = xs.min(), ys.min(), xs.max() + 1, ys.max() + 1
        if mode == "poly":
            polys = binary_mask_to_polygon(mask)
            seg = [p.reshape(-1).tolist() for p in polys if p.size >= 6]
            if not seg:
                continue
        else:
            seg = rle_string_encode(mask)
        annos.append(
            {
                "id": start_ann_id + len(annos),
                "image_id": image_id,
                "category_id": cat_id,
                "segmentation": seg,
                "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
                "area": float(mask.sum()),
                "iscrowd": 0,
            }
        )
    return annos


def id_to_rgb(seg_id: int) -> Tuple[int, int, int]:
    """panopticapi encoding: id = R + 256*G + 256^2*B."""
    return seg_id % 256, (seg_id // 256) % 256, (seg_id // 256**2) % 256


def rgb_to_id(color: np.ndarray) -> np.ndarray:
    color = color.astype(np.uint32)
    return color[..., 0] + 256 * color[..., 1] + 256**2 * color[..., 2]


def masks_to_panoptic_record(
    semantic: np.ndarray,
    instance: np.ndarray,
    image_id,
    next_segment_id: int,
) -> Tuple[np.ndarray, List[Dict], int]:
    """One image's masks -> (panoptic RGB map, segments_info, next_segment_id).

    Things come from the instance map; every remaining labeled-background
    pixel becomes one 'background' stuff segment (id 21), matching the
    reference's cat_id==0 -> len(categories) remap (panoptic converter :264).
    """
    h, w = instance.shape
    pan = np.zeros((h, w, 3), dtype=np.uint8)
    segments_info: List[Dict] = []

    regions = list(_instance_entries(semantic, instance))
    bg_mask = (instance == 0) & (semantic != 255)
    if bg_mask.any():
        regions.append((0, BACKGROUND_CATEGORY_ID, bg_mask))

    for _, cat_id, mask in regions:
        seg_id = next_segment_id
        next_segment_id += 1
        pan[mask] = id_to_rgb(seg_id)
        ys, xs = np.nonzero(mask)
        segments_info.append(
            {
                "id": seg_id,
                "category_id": cat_id,
                "area": int(mask.sum()),
                "bbox": [int(xs.min()), int(ys.min()),
                         int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)],
                "iscrowd": 0,
            }
        )
    return pan, segments_info, next_segment_id


def convert_split_instance(
    ids: Sequence[str],
    split: str,
    voc_root: str,
    sbd_root: Optional[str],
    out_dir: str,
    copy_images: bool = True,
    mode: str = "poly",
) -> str:
    """Write {out_dir}/annotations/{split}_instance.json (+ image copies)."""
    ann_dir = os.path.join(out_dir, "annotations")
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(ann_dir, exist_ok=True)
    images, annotations = [], []
    for name in ids:
        semantic, instance = load_masks_auto(name, voc_root, sbd_root)
        annos = masks_to_instance_annotations(
            semantic, instance, name, len(annotations) + 1, mode=mode
        )
        if not annos:
            continue
        h, w = instance.shape
        images.append({"id": name, "file_name": name + ".jpg", "height": h, "width": w})
        annotations.extend(annos)
        if copy_images:
            os.makedirs(img_dir, exist_ok=True)
            src = os.path.join(voc_root, "JPEGImages", name + ".jpg")
            if not os.path.isfile(src) and sbd_root:
                src = os.path.join(sbd_root, "img", name + ".jpg")
            dst = os.path.join(img_dir, name + ".jpg")
            if os.path.isfile(src) and not os.path.isfile(dst):
                shutil.copyfile(src, dst)
    out_json = os.path.join(ann_dir, f"{split}_instance.json")
    with open(out_json, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations,
             "categories": [c for c in VOC_CATEGORIES if c["isthing"]]},
            f,
        )
    return out_json


def convert_split_panoptic(
    ids: Sequence[str],
    split: str,
    voc_root: str,
    sbd_root: Optional[str],
    out_dir: str,
) -> str:
    """Write {split}_panoptic.json + id-encoded PNGs under annotations/panoptic/."""
    ann_dir = os.path.join(out_dir, "annotations")
    pan_dir = os.path.join(ann_dir, "panoptic")
    os.makedirs(pan_dir, exist_ok=True)
    images, annotations = [], []
    next_id = 1
    for name in ids:
        semantic, instance = load_masks_auto(name, voc_root, sbd_root)
        pan, segments_info, next_id = masks_to_panoptic_record(
            semantic, instance, name, next_id
        )
        if not segments_info:
            continue
        h, w = instance.shape
        images.append({"id": name, "file_name": name + ".jpg", "height": h, "width": w})
        annotations.append(
            {"image_id": name, "file_name": name + ".png", "segments_info": segments_info}
        )
        Image.fromarray(pan).save(os.path.join(pan_dir, name + ".png"))
    out_json = os.path.join(ann_dir, f"{split}_panoptic.json")
    with open(out_json, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations, "categories": VOC_CATEGORIES},
            f,
        )
    return out_json


def separate_semantic_from_panoptic(
    panoptic_json: str,
    panoptic_root: str,
    sem_seg_root: str,
    categories: List[Dict] = VOC_CATEGORIES,
) -> None:
    """PanopticFPN 'separated' stuff PNGs: things -> 0, stuff -> 1.., void -> 255
    (reference prepare_panoptic_fpn_voc2012_and_sbd.py:28)."""
    os.makedirs(sem_seg_root, exist_ok=True)
    id_map = {0: 255}
    stuff_i = 0
    for c in categories:
        if c["isthing"]:
            id_map[c["id"]] = 0
        else:
            stuff_i += 1
            id_map[c["id"]] = stuff_i
    with open(panoptic_json) as f:
        obj = json.load(f)
    for anno in obj["annotations"]:
        pan = np.asarray(
            Image.open(os.path.join(panoptic_root, anno["file_name"])), dtype=np.uint32
        )
        pan_id = rgb_to_id(pan)
        out = np.full(pan_id.shape, 255, dtype=np.uint8)
        for seg in anno["segments_info"]:
            out[pan_id == seg["id"]] = id_map[seg["category_id"]]
        Image.fromarray(out).save(os.path.join(sem_seg_root, anno["file_name"]))
