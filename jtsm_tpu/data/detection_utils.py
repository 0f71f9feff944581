"""Annotation/augmentation plumbing + the static-batch collator.

Reference: detectron2/data/detection_utils.py (:165 ``read_image``, :260
``transform_instance_annotations``, :366 ``annotations_to_instances``,
:460 ``filter_empty_instances``, :571 ``build_augmentation``).

TPU addition: ``instances_to_static_targets`` / ``build_static_batch``
convert per-image Instances into the fixed-capacity padded arrays the
compiled model consumes (see meta_arch/rcnn.py input contract).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..structures import (
    BitMasks,
    BoxMode,
    Instances,
    Keypoints,
    PolygonMasks,
    RotatedBoxes,
    polygons_to_bitmask,
    rasterize_polygons_within_box,
)
from . import transforms as T
from .catalog import MetadataCatalog
from .rle import decode_segmentation


class SizeMismatchError(ValueError):
    pass


_EXIF_ORIENT = 274


def _apply_exif_orientation(image: Image.Image) -> Image.Image:
    try:
        exif = image.getexif()
    except Exception:
        exif = None
    if exif is None:
        return image
    orientation = exif.get(_EXIF_ORIENT)
    method = {
        2: Image.FLIP_LEFT_RIGHT,
        3: Image.ROTATE_180,
        4: Image.FLIP_TOP_BOTTOM,
        5: Image.TRANSPOSE,
        6: Image.ROTATE_270,
        7: Image.TRANSVERSE,
        8: Image.ROTATE_90,
    }.get(orientation)
    if method is not None:
        return image.transpose(method)
    return image


def convert_PIL_to_numpy(image: Image.Image, format: Optional[str]) -> np.ndarray:
    if format is not None:
        conversion_format = format
        if format in ["BGR", "YUV-BT.601"]:
            conversion_format = "RGB"
        image = image.convert(conversion_format)
    image = np.asarray(image)
    if format == "L":
        image = np.expand_dims(image, -1)
    elif format == "BGR":
        image = image[:, :, ::-1]
    elif format == "YUV-BT.601":
        image = image / 255.0
        image = np.dot(image, np.array(
            [[0.299, -0.14713, 0.615], [0.587, -0.28886, -0.51499], [0.114, 0.436, -0.10001]]
        ))
    return image


def read_image(file_name: str, format: Optional[str] = None) -> np.ndarray:
    """Reference detection_utils.py:165 (with EXIF rotation)."""
    with open(file_name, "rb") as f:
        image = Image.open(f)
        image = _apply_exif_orientation(image)
        return convert_PIL_to_numpy(image, format)


def check_image_size(dataset_dict: dict, image: np.ndarray) -> None:
    if "width" in dataset_dict or "height" in dataset_dict:
        image_wh = (image.shape[1], image.shape[0])
        expected_wh = (dataset_dict["width"], dataset_dict["height"])
        if not image_wh == expected_wh:
            raise SizeMismatchError(
                f"Mismatched image shape for {dataset_dict.get('file_name', '')}: "
                f"got {image_wh}, expect {expected_wh}."
            )
    if "width" not in dataset_dict:
        dataset_dict["width"] = image.shape[1]
    if "height" not in dataset_dict:
        dataset_dict["height"] = image.shape[0]


def transform_proposals(
    dataset_dict, image_shape, transforms, *, proposal_topk, min_box_size=0
):
    """Reference detection_utils.py:212 — apply transforms to precomputed
    proposal boxes and keep topk."""
    if "proposal_boxes" not in dataset_dict:
        return
    boxes = BoxMode.convert(
        np.asarray(dataset_dict.pop("proposal_boxes")),
        dataset_dict.pop("proposal_bbox_mode"),
        BoxMode.XYXY_ABS,
    )
    boxes = transforms.apply_box(boxes)
    boxes = np.clip(boxes, [0, 0, 0, 0], [image_shape[1], image_shape[0]] * 2)
    objectness_logits = np.asarray(dataset_dict.pop("proposal_objectness_logits"))
    keep = ((boxes[:, 2] - boxes[:, 0]) > min_box_size) & (
        (boxes[:, 3] - boxes[:, 1]) > min_box_size
    )
    boxes = boxes[keep]
    objectness_logits = objectness_logits[keep]
    order = np.argsort(-objectness_logits)[:proposal_topk]
    dataset_dict["proposals"] = {
        "boxes": boxes[order].astype(np.float32),
        "objectness_logits": objectness_logits[order].astype(np.float32),
    }


def transform_instance_annotations(
    annotation: dict, transforms, image_size: Tuple[int, int], *, keypoint_hflip_indices=None
) -> dict:
    """Reference detection_utils.py:260."""
    if isinstance(transforms, (tuple, list)):
        transforms = T.TransformList(transforms)
    if annotation["bbox_mode"] == BoxMode.XYWHA_ABS:
        # rotated boxes go through the rotated-rect transform action instead
        # of being axis-aligned (reference detection_utils.py:271-273)
        annotation["bbox"] = transforms.apply_rotated_box(
            np.asarray([annotation["bbox"]], dtype=np.float64)
        )[0]
    else:
        bbox = BoxMode.convert(annotation["bbox"], annotation["bbox_mode"], BoxMode.XYXY_ABS)
        bbox = transforms.apply_box(np.array([bbox]))[0]
        bbox = np.minimum(bbox, list(image_size + image_size)[::-1])
        bbox = np.maximum(bbox, 0)
        annotation["bbox"] = bbox
        annotation["bbox_mode"] = BoxMode.XYXY_ABS

    if "segmentation" in annotation:
        segm = annotation["segmentation"]
        if isinstance(segm, list):
            polygons = [np.asarray(p).reshape(-1, 2) for p in segm]
            annotation["segmentation"] = [
                p.reshape(-1) for p in transforms.apply_polygons(
                    [p.reshape(-1) for p in polygons]
                )
            ]
        elif isinstance(segm, dict):
            mask = decode_segmentation(segm, *segm["size"])
            mask = transforms.apply_segmentation(mask.astype(np.uint8)).astype(bool)
            annotation["segmentation"] = mask
        else:
            raise ValueError(f"Unsupported segmentation type {type(segm)}")

    if "keypoints" in annotation:
        annotation["keypoints"] = transform_keypoint_annotations(
            annotation["keypoints"], transforms, image_size, keypoint_hflip_indices
        )
    return annotation


def transform_keypoint_annotations(
    keypoints, transforms, image_size, keypoint_hflip_indices=None
):
    keypoints = np.asarray(keypoints, dtype="float64").reshape(-1, 3)
    keypoints_xy = transforms.apply_coords(keypoints[:, :2])
    if isinstance(transforms, T.TransformList):
        do_hflip = sum(1 for t in transforms.transforms if isinstance(t, T.HFlipTransform)) % 2 == 1
    else:
        do_hflip = isinstance(transforms, T.HFlipTransform)
    keypoints[:, :2] = keypoints_xy
    if do_hflip and keypoint_hflip_indices is not None:
        keypoints = keypoints[np.asarray(keypoint_hflip_indices, dtype=np.int32), :]
    inside = (keypoints_xy >= np.array([0, 0])) & (
        keypoints_xy <= np.array(image_size[::-1])
    )
    inside = inside.all(axis=1)
    keypoints[:, 2][~inside] = 0
    keypoints[keypoints[:, 2] == 0] = 0
    return keypoints


def annotations_to_instances(
    annos: List[dict], image_size: Tuple[int, int], mask_format: str = "polygon"
) -> Instances:
    """Reference detection_utils.py:366. Host-side; fields are numpy."""
    boxes = np.stack(
        [BoxMode.convert(obj["bbox"], obj["bbox_mode"], BoxMode.XYXY_ABS) for obj in annos]
    ).astype(np.float32) if len(annos) else np.zeros((0, 4), np.float32)
    target = Instances(image_size)
    target.gt_boxes = boxes
    target.gt_classes = np.asarray(
        [int(obj["category_id"]) for obj in annos], dtype=np.int64
    )

    if len(annos) and "segmentation" in annos[0]:
        segms = [obj["segmentation"] for obj in annos]
        if mask_format == "polygon":
            target.gt_masks = PolygonMasks(
                [[np.asarray(p) for p in segm] if isinstance(segm, list) else _mask_to_poly(segm) for segm in segms]
            )
        else:
            masks = []
            for segm in segms:
                if isinstance(segm, list):
                    masks.append(polygons_to_bitmask([np.asarray(p) for p in segm], *image_size))
                elif isinstance(segm, dict):
                    masks.append(decode_segmentation(segm, *image_size))
                elif isinstance(segm, np.ndarray):
                    masks.append(segm.astype(bool))
                else:
                    raise ValueError(f"Unsupported segmentation {type(segm)}")
            target.gt_masks = np.stack(masks) if masks else np.zeros((0,) + image_size, bool)

    if len(annos) and "keypoints" in annos[0]:
        target.gt_keypoints = np.stack(
            [np.asarray(obj.get("keypoints", np.zeros(0))).reshape(-1, 3) for obj in annos]
        ).astype(np.float32)

    return target


def annotations_to_instances_rotated(
    annos: List[dict], image_size: Tuple[int, int]
) -> Instances:
    """Reference detection_utils.py:431 — rotated (N, 5) XYWHA GT, clipped
    with the nearly-axis-aligned-only rule of RotatedBoxes.clip. Host-side;
    fields are numpy."""
    boxes = (
        np.stack([np.asarray(obj["bbox"], dtype=np.float32) for obj in annos])
        if len(annos)
        else np.zeros((0, 5), np.float32)
    )
    # numpy re-statement of RotatedBoxes.clip (nearly-axis-aligned-only rule):
    # this runs per sample on the host data path, so no eager jnp dispatch here
    h, w = image_size
    a = (boxes[:, 4] + 180.0) % 360.0 - 180.0
    nearly_aligned = np.abs(a) <= 1.0
    x1 = np.clip(boxes[:, 0] - boxes[:, 2] / 2.0, 0, w)
    y1 = np.clip(boxes[:, 1] - boxes[:, 3] / 2.0, 0, h)
    x2 = np.clip(boxes[:, 0] + boxes[:, 2] / 2.0, 0, w)
    y2 = np.clip(boxes[:, 1] + boxes[:, 3] / 2.0, 0, h)
    clipped = np.stack(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1, boxes[:, 4]], axis=-1
    )
    boxes = np.where(nearly_aligned[:, None], clipped, boxes).astype(np.float32)
    target = Instances(image_size)
    target.gt_boxes = boxes
    target.gt_classes = np.asarray(
        [int(obj["category_id"]) for obj in annos], dtype=np.int64
    )
    return target


def _mask_to_poly(segm):
    """Bitmask annotation in polygon mode: keep the raw mask in a 1-elt list
    marker (rasterized later)."""
    return [segm]


def filter_empty_instances(
    instances: Instances, by_box: bool = True, by_mask: bool = True, box_threshold: float = 1e-5
) -> Instances:
    """Reference detection_utils.py:460 (host-side numpy version)."""
    r = []
    if by_box:
        b = instances.gt_boxes
        if b.shape[-1] == 5:  # rotated XYWHA: nonempty is w>thr & h>thr
            widths = b[:, 2]
            heights = b[:, 3]
        else:
            widths = b[:, 2] - b[:, 0]
            heights = b[:, 3] - b[:, 1]
        r.append((widths > box_threshold) & (heights > box_threshold))
    if instances.has("gt_masks") and by_mask:
        gm = instances.gt_masks
        if isinstance(gm, PolygonMasks):
            r.append(gm.nonempty())
        else:
            r.append(np.asarray(gm).reshape(len(gm), -1).any(axis=1))
    if not r:
        return instances
    m = r[0]
    for x in r[1:]:
        m = m & x
    return instances[np.asarray(m)]


def create_keypoint_hflip_indices(dataset_names) -> np.ndarray:
    if isinstance(dataset_names, str):
        dataset_names = [dataset_names]
    meta = MetadataCatalog.get(dataset_names[0])
    names = meta.keypoint_names
    flip_map = dict(meta.keypoint_flip_map)
    flip_map.update({v: k for k, v in flip_map.items()})
    flipped_names = [i if i not in flip_map else flip_map[i] for i in names]
    return np.asarray([names.index(i) for i in flipped_names])


def convert_image_to_rgb(image: np.ndarray, format: str) -> np.ndarray:
    """Convert an image from the given format to an RGB uint8 array
    (reference detection_utils.py:120 — used by visualization paths)."""
    image = np.asarray(image)
    if format == "BGR":
        image = image[:, :, [2, 1, 0]]
    elif format == "YUV-BT.601":
        image = np.dot(image, np.linalg.inv(_M_YUV_BT601.T)) * 255.0
    elif format == "L":
        image = image[:, :, 0] if image.ndim == 3 else image
        image = np.stack([image] * 3, axis=-1)
    return np.clip(image, 0, 255).astype(np.uint8)


_M_YUV_BT601 = np.array(
    [[0.299, 0.587, 0.114], [-0.14713, -0.28886, 0.436], [0.615, -0.51499, -0.10001]]
)


def check_metadata_consistency(key: str, dataset_names) -> None:
    """Assert that all datasets agree on a metadata key (reference
    detection_utils.py:543 — catches e.g. training on datasets with
    different class lists)."""
    if len(dataset_names) == 0:
        return
    entries_per_dataset = [
        getattr(MetadataCatalog.get(d), key) for d in dataset_names
    ]
    for idx, entry in enumerate(entries_per_dataset):
        if entry != entries_per_dataset[0]:
            logger = logging.getLogger(__name__)
            logger.error(
                f"Metadata '{key}' for dataset '{dataset_names[idx]}' is '{entry}'"
            )
            logger.error(
                f"Metadata '{key}' for dataset '{dataset_names[0]}' is "
                f"'{entries_per_dataset[0]}'"
            )
            raise ValueError(
                f"Datasets have different metadata '{key}'!"
            )


def gen_crop_transform_with_instance(crop_size, image_size, instance) -> T.CropTransform:
    """Generate a CropTransform whose window contains the center of the given
    instance annotation (reference detection_utils.py:512)."""
    crop_size = np.asarray(crop_size, dtype=np.int32)
    bbox = BoxMode.convert(instance["bbox"], instance["bbox_mode"], BoxMode.XYXY_ABS)
    center_yx = (bbox[1] + bbox[3]) * 0.5, (bbox[0] + bbox[2]) * 0.5
    assert (
        image_size[0] >= center_yx[0] and image_size[1] >= center_yx[1]
    ), "The annotation bounding box is outside of the image!"
    assert (
        image_size[0] >= crop_size[0] and image_size[1] >= crop_size[1]
    ), "Crop size is larger than image size!"

    min_yx = np.maximum(np.floor(center_yx).astype(np.int32) - crop_size, 0)
    max_yx = np.maximum(np.asarray(image_size, dtype=np.int32) - crop_size, 0)
    max_yx = np.minimum(max_yx, np.ceil(center_yx).astype(np.int32))

    y0 = np.random.randint(min_yx[0], max_yx[0] + 1)
    x0 = np.random.randint(min_yx[1], max_yx[1] + 1)
    return T.CropTransform(x0, y0, crop_size[1], crop_size[0])


def build_augmentation(cfg, is_train: bool) -> List[T.Augmentation]:
    """Reference detection_utils.py:571."""
    if is_train:
        min_size = cfg.INPUT.MIN_SIZE_TRAIN
        max_size = cfg.INPUT.MAX_SIZE_TRAIN
        sample_style = cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING
    else:
        min_size = cfg.INPUT.MIN_SIZE_TEST
        max_size = cfg.INPUT.MAX_SIZE_TEST
        sample_style = "choice"
    augmentation = [T.ResizeShortestEdge(min_size, max_size, sample_style)]
    if is_train and cfg.INPUT.RANDOM_FLIP != "none":
        augmentation.append(
            T.RandomFlip(
                horizontal=cfg.INPUT.RANDOM_FLIP == "horizontal",
                vertical=cfg.INPUT.RANDOM_FLIP == "vertical",
            )
        )
    return augmentation


# ---------------------------------------------------------------------------
# Static-batch collation (TPU-specific)
# ---------------------------------------------------------------------------


def pick_bucket(h: int, w: int, buckets: Sequence[Sequence[int]]) -> Tuple[int, int]:
    """Smallest bucket that fits (h, w); falls back to the largest."""
    best = None
    best_area = None
    for bh, bw in buckets:
        if bh >= h and bw >= w:
            if best_area is None or bh * bw < best_area:
                best, best_area = (bh, bw), bh * bw
    if best is None:
        best = tuple(max(b[i] for b in buckets) for i in (0, 1))
    return best


def instances_to_static_targets(
    instances: Instances,
    max_instances: int,
    mask_crop_size: int = 0,
) -> Dict[str, np.ndarray]:
    """Instances (numpy fields) -> fixed-capacity padded target arrays."""
    n = min(len(instances), max_instances)
    g = max_instances
    out = {
        "gt_boxes": np.zeros((g, 4), np.float32),
        "gt_classes": np.zeros((g,), np.int32),
        "gt_valid": np.zeros((g,), bool),
    }
    boxes = np.asarray(instances.gt_boxes)[:n]
    out["gt_boxes"][:n] = boxes
    out["gt_classes"][:n] = np.asarray(instances.gt_classes)[:n]
    out["gt_valid"][:n] = True

    if mask_crop_size > 0:
        out["gt_mask_crops"] = np.zeros((g, mask_crop_size, mask_crop_size), bool)
        if instances.has("gt_masks"):
            gm = instances.gt_masks
            for i in range(n):
                box = boxes[i]
                if isinstance(gm, PolygonMasks):
                    polys = gm.polygons[i]
                    if len(polys) == 1 and not isinstance(polys[0], np.ndarray):
                        continue
                    out["gt_mask_crops"][i] = rasterize_polygons_within_box(
                        polys, box, mask_crop_size
                    )
                else:
                    mask = np.asarray(gm[i] if gm.ndim == 3 else gm)
                    out["gt_mask_crops"][i] = _crop_bitmask(mask, box, mask_crop_size)
    if instances.has("gt_keypoints"):
        k = np.asarray(instances.gt_keypoints)
        kk = k.shape[1] if k.ndim == 3 else 17
        out["gt_keypoints"] = np.zeros((g, kk, 3), np.float32)
        out["gt_keypoints"][:n] = k[:n]
    # project extension fields (e.g. the DensePose mapper's per-gt surface
    # points gt_dp_*): ndarray fields named gt_dp_* pad along the instance
    # dim and collate like the built-in targets
    for name, value in instances.get_fields().items():
        if name.startswith("gt_dp_"):
            v = np.asarray(value)
            out[name] = np.zeros((g,) + v.shape[1:], v.dtype)
            out[name][:n] = v[:n]
    return out


def _crop_bitmask(mask: np.ndarray, box: np.ndarray, size: int) -> np.ndarray:
    h, w = mask.shape
    x0, y0, x1, y1 = box
    xs = np.clip(np.linspace(x0, x1, size, endpoint=False) + (x1 - x0) / (2 * size), 0, w - 1).astype(int)
    ys = np.clip(np.linspace(y0, y1, size, endpoint=False) + (y1 - y0) / (2 * size), 0, h - 1).astype(int)
    return mask[ys[:, None], xs[None, :]]


def build_static_batch(
    per_image: List[dict],
    buckets: Sequence[Sequence[int]],
    max_instances: int = 0,
    mask_crop_size: int = 0,
    proposal_topk: int = 0,
) -> Dict[str, np.ndarray]:
    """Collate mapped per-image dicts (image CHW->HWC numpy + instances) into
    one static padded batch. All images in the batch share one bucket (the
    loader groups by bucket / aspect ratio)."""
    b = len(per_image)
    hs = [d["image"].shape[0] for d in per_image]
    ws = [d["image"].shape[1] for d in per_image]
    bh, bw = pick_bucket(max(hs), max(ws), buckets)

    batch: Dict[str, np.ndarray] = {
        "image": np.zeros((b, bh, bw, 3), np.float32),
        "image_sizes": np.zeros((b, 2), np.int32),
        "orig_sizes": np.zeros((b, 2), np.int32),
    }
    has_gt = max_instances > 0 and any("instances" in d for d in per_image)
    per_tgt: List[Optional[dict]] = [None] * b
    if has_gt:
        for i, d in enumerate(per_image):
            if "instances" in d:
                per_tgt[i] = instances_to_static_targets(
                    d["instances"], max_instances, mask_crop_size
                )
        # allocate from the UNION of per-image target keys (optional fields
        # like gt_keypoints / gt_mask_crops appear only when the dataset
        # carries them; templating from an empty Instances dropped them)
        for tgt in per_tgt:
            if tgt is None:
                continue
            for k, v in tgt.items():
                if k not in batch:
                    batch[k] = np.zeros((b,) + v.shape, v.dtype)
    if proposal_topk > 0:
        batch["proposals"] = np.zeros((b, proposal_topk, 4), np.float32)
        batch["proposal_scores"] = np.full((b, proposal_topk), -np.inf, np.float32)

    has_sem_seg = any("sem_seg" in d for d in per_image)
    if has_sem_seg:
        batch["gt_sem_seg"] = np.full((b, bh, bw), 255, np.int32)

    for i, d in enumerate(per_image):
        img = d["image"]
        h, w = img.shape[:2]
        batch["image"][i, :h, :w] = img
        batch["image_sizes"][i] = (h, w)
        batch["orig_sizes"][i] = (d.get("height", h), d.get("width", w))
        if has_sem_seg and "sem_seg" in d:
            batch["gt_sem_seg"][i, :h, :w] = d["sem_seg"]
        if per_tgt[i] is not None:
            for k, v in per_tgt[i].items():
                batch[k][i] = v
        if proposal_topk > 0 and "proposals" in d:
            p = d["proposals"]
            n = min(len(p["boxes"]), proposal_topk)
            batch["proposals"][i, :n] = p["boxes"][:n]
            batch["proposal_scores"][i, :n] = p["objectness_logits"][:n]
    return batch
