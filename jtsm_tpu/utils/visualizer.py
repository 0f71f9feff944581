"""Drawing utilities (reference: detectron2/utils/visualizer.py ``Visualizer``
— boxes/rotated boxes/masks/polygons/keypoints/panoptic overlays,
``_jitter`` instance colors, ``overlay_instances``). PIL-based
re-implementation of the drawing surface (the reference uses matplotlib)."""

from __future__ import annotations

import colorsys
from enum import Enum
from typing import Dict, List, Optional, Sequence, Union

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from ..data.catalog import MetadataCatalog
from .colormap import colormap

_COLORS = colormap(rgb=True).astype(np.uint8)


class ColorMode(Enum):
    """Instance-visualization color policy (reference visualizer.py:37).

    IMAGE: a random (jittered) color per instance. SEGMENTATION: instances of
    the same category share similar colors from ``metadata.thing_colors``.
    IMAGE_BW: draw on a grayscale copy of the image, keeping color only
    inside instance masks."""

    IMAGE = 0
    SEGMENTATION = 1
    IMAGE_BW = 2


class GenericMask:
    """Unified view over a mask given as polygons, COCO RLE dict, or a binary
    array (reference visualizer.py ``GenericMask``) — converts lazily between
    representations."""

    def __init__(self, mask_or_polygons, height: int, width: int):
        self._mask = self._polygons = None
        self.height, self.width = height, width
        m = mask_or_polygons
        if isinstance(m, dict):  # COCO RLE
            from ..data.rle import decode_segmentation

            self._mask = decode_segmentation(m, height, width).astype(np.uint8)
        elif isinstance(m, list):  # list of flat polygons
            self._polygons = [np.asarray(p, np.float64).reshape(-1) for p in m]
        elif isinstance(m, np.ndarray):
            assert m.shape[1] != 2, m.shape
            assert m.shape == (height, width), m.shape
            self._mask = (np.asarray(m) > 0.5).astype(np.uint8)
        else:
            raise ValueError(f"GenericMask cannot handle object {m} of type {type(m)}")

    @property
    def mask(self) -> np.ndarray:
        if self._mask is None:
            self._mask = self.polygons_to_mask(self._polygons)
        return self._mask

    @property
    def polygons(self) -> List[np.ndarray]:
        if self._polygons is None:
            self._polygons = [
                p.reshape(-1) for p in mask_to_polygons(self._mask.astype(bool))
            ]
        return self._polygons

    def polygons_to_mask(self, polygons) -> np.ndarray:
        from ..structures.masks import polygons_to_bitmask

        return polygons_to_bitmask(
            [np.asarray(p, np.float64) for p in polygons], self.height, self.width
        ).astype(np.uint8)

    def area(self) -> float:
        return float(self.mask.sum())

    def bbox(self) -> np.ndarray:
        ys, xs = np.nonzero(self.mask)
        if len(ys) == 0:
            return np.zeros(4)
        return np.asarray(
            [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float64
        )

_KEYPOINT_EDGES = [  # COCO person skeleton (reference visualizer draws lines)
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
]


def _jitter(color, seed: int) -> tuple:
    """Randomly shift a color in HSV so same-class instances stay
    distinguishable (reference visualizer.py ``_jitter``); deterministic in
    ``seed`` for reproducible output."""
    rng = np.random.RandomState(seed)
    h, s, v = colorsys.rgb_to_hsv(*(np.asarray(color, np.float32) / 255.0))
    h = (h + rng.uniform(-0.06, 0.06)) % 1.0
    s = float(np.clip(s + rng.uniform(-0.25, 0.25), 0.3, 1.0))
    v = float(np.clip(v + rng.uniform(-0.2, 0.2), 0.4, 1.0))
    return tuple(int(c * 255) for c in colorsys.hsv_to_rgb(h, s, v))


def mask_to_polygons(mask: np.ndarray) -> List[np.ndarray]:
    """Boundary polygons of a bool mask via cv2 contours; [] without cv2."""
    try:
        import cv2
    except ImportError:
        return []
    m = np.ascontiguousarray(mask.astype(np.uint8))
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    return [c.reshape(-1, 2).astype(np.float64) for c in contours if len(c) >= 3]


class VisImage:
    def __init__(self, img: np.ndarray):
        self.pil = Image.fromarray(img.astype(np.uint8))
        self.draw = ImageDraw.Draw(self.pil, "RGBA")

    def get_image(self) -> np.ndarray:
        return np.asarray(self.pil)

    def save(self, filepath: str) -> None:
        self.pil.save(filepath)


class Visualizer:
    def __init__(
        self,
        img_rgb: np.ndarray,
        metadata=None,
        scale: float = 1.0,
        instance_mode: ColorMode = ColorMode.IMAGE,
    ):
        self.img = np.asarray(img_rgb).clip(0, 255).astype(np.uint8)
        if self.img.ndim == 2:
            self.img = np.stack([self.img] * 3, axis=-1)
        self.metadata = metadata if metadata is not None else MetadataCatalog.get("__nonexist__")
        self._instance_mode = instance_mode
        self.output = VisImage(self.img)

    def _create_grayscale_image(self, mask: Optional[np.ndarray] = None) -> np.ndarray:
        """Grayscale copy of the original image, keeping color inside ``mask``
        (reference visualizer.py:1125)."""
        img_bw = self.img.astype(np.float32).mean(axis=2)
        img_bw = np.stack([img_bw] * 3, axis=2)
        if mask is not None:
            img_bw[mask] = self.img[mask]
        return img_bw.astype(np.uint8)

    def _instance_color(self, cls_id: int, idx: int) -> tuple:
        """Per-instance color under the active ColorMode."""
        thing_colors = self.metadata.get("thing_colors")
        if self._instance_mode == ColorMode.SEGMENTATION and thing_colors:
            base = thing_colors[cls_id % len(thing_colors)]
            return _jitter(base, seed=idx)
        return _jitter(_COLORS[cls_id % len(_COLORS)], seed=idx)

    def _class_name(self, cls_id: int, kind: str = "thing") -> str:
        names = self.metadata.get(f"{kind}_classes")
        if names and 0 <= cls_id < len(names):
            return names[cls_id]
        return str(cls_id)

    # ------------------------------------------------------------- primitives
    def draw_box(self, box, color=(0, 255, 0), width: int = 2):
        x0, y0, x1, y1 = [float(v) for v in box]
        self.output.draw.rectangle([x0, y0, x1, y1], outline=tuple(color), width=width)
        return self.output

    def draw_rotated_box_with_label(
        self, rotated_box, color=(0, 255, 0), label: Optional[str] = None, width: int = 2
    ):
        """(cx, cy, w, h, angle_degrees) box; angle is CCW like the reference
        ``draw_rotated_box_with_label``."""
        cx, cy, w, h, a = [float(v) for v in rotated_box]
        theta = -a * np.pi / 180.0  # image y axis points down
        c, s = np.cos(theta), np.sin(theta)
        rect = np.asarray(
            [[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]]
        )
        rot = rect @ np.asarray([[c, -s], [s, c]]).T + np.asarray([cx, cy])
        pts = [tuple(p) for p in rot]
        self.output.draw.polygon(pts, outline=tuple(color), width=width)
        if label:
            self.draw_text(label, rot[np.argmin(rot[:, 1])], color=color)
        return self.output

    def draw_polygon(self, segment, color=(0, 255, 0), edge_color=None, alpha: float = 0.45):
        """Filled polygon with outline (reference ``draw_polygon``); segment
        is (N, 2) xy or a flat [x0, y0, x1, y1, ...] list."""
        seg = np.asarray(segment, np.float64)
        if seg.ndim == 1:
            seg = seg.reshape(-1, 2)
        pts = [tuple(p) for p in seg]
        if len(pts) < 3:
            return self.output
        fill = (*tuple(color), int(alpha * 255))
        edge = tuple(edge_color) if edge_color is not None else tuple(color)
        self.output.draw.polygon(pts, fill=fill, outline=edge)
        return self.output

    def draw_text(self, text: str, position, color=(255, 255, 255)):
        x, y = position
        self.output.draw.text((x, max(y - 10, 0)), text, fill=tuple(color))
        return self.output

    def draw_binary_mask(
        self,
        mask: np.ndarray,
        color=(0, 255, 0),
        alpha: float = 0.45,
        edge: bool = True,
        text: Optional[str] = None,
    ):
        mask = np.asarray(mask, bool)
        overlay = np.zeros((*mask.shape, 4), np.uint8)
        overlay[mask] = (*color, int(alpha * 255))
        im = Image.fromarray(overlay, "RGBA")
        self.output.pil.paste(im, (0, 0), im)
        self.output.draw = ImageDraw.Draw(self.output.pil, "RGBA")
        if edge:
            for poly in mask_to_polygons(mask):
                self.output.draw.polygon(
                    [tuple(p) for p in poly], outline=tuple(color)
                )
        if text:
            ys, xs = np.nonzero(mask)
            if len(ys):
                self.draw_text(text, (xs.mean(), ys.mean()))
        return self.output

    def draw_keypoints(self, keypoints: np.ndarray, color=(255, 0, 0), radius: int = 2):
        kps = np.asarray(keypoints)
        for x, y, *rest in kps:
            self.output.draw.ellipse(
                [x - radius, y - radius, x + radius, y + radius], fill=tuple(color)
            )
        if len(kps) == 17:  # COCO person: draw the skeleton
            for a, b in _KEYPOINT_EDGES:
                xa, ya = float(kps[a][0]), float(kps[a][1])
                xb, yb = float(kps[b][0]), float(kps[b][1])
                self.output.draw.line([xa, ya, xb, yb], fill=tuple(color), width=1)
        return self.output

    # ---------------------------------------------------------- generic API
    def overlay_instances(
        self,
        boxes: Optional[np.ndarray] = None,
        labels: Optional[Sequence[str]] = None,
        masks: Optional[Sequence[np.ndarray]] = None,
        keypoints: Optional[np.ndarray] = None,
        assigned_colors: Optional[Sequence] = None,
        alpha: float = 0.45,
    ):
        """Reference ``overlay_instances``: draw any subset of
        boxes/labels/full-res masks/keypoints with per-instance colors."""
        n = 0
        for cand in (boxes, masks, keypoints, labels):
            if cand is not None:
                n = len(cand)
                break
        for i in range(n):
            if assigned_colors is not None:
                color = tuple(int(c) for c in assigned_colors[i])
            else:
                color = _jitter(_COLORS[i % len(_COLORS)], seed=i)
            if boxes is not None:
                box = np.asarray(boxes[i], np.float64)
                if box.shape[-1] == 5:
                    self.draw_rotated_box_with_label(
                        box, color=color, label=labels[i] if labels else None
                    )
                else:
                    self.draw_box(box, color=color)
                    if labels:
                        self.draw_text(labels[i], (box[0], box[1]), color=color)
            if masks is not None:
                self.draw_binary_mask(np.asarray(masks[i]) > 0.5, color=color, alpha=alpha)
                if labels and boxes is None:
                    ys, xs = np.nonzero(np.asarray(masks[i]) > 0.5)
                    if len(ys):
                        self.draw_text(labels[i], (xs.mean(), ys.mean()), color=color)
            if keypoints is not None:
                self.draw_keypoints(keypoints[i], color=color)
        return self.output

    def draw_instance_predictions(self, predictions: Dict[str, np.ndarray]):
        """Draw the batched-output detection dict for ONE image:
        boxes/scores/classes/valid (+ masks 28x28 probs or full-res)."""
        boxes = np.asarray(predictions["boxes"])
        scores = np.asarray(predictions["scores"])
        classes = np.asarray(predictions["classes"])
        valid = np.asarray(predictions.get("valid", np.ones(len(boxes), bool)))
        masks = predictions.get("masks")
        h, w = self.img.shape[:2]

        if self._instance_mode == ColorMode.IMAGE_BW:
            keep_color = np.zeros((h, w), bool)
            if masks is not None:
                for i in range(len(boxes)):
                    if valid[i] and np.asarray(masks[i]).shape == (h, w):
                        keep_color |= np.asarray(masks[i]) > 0.5
            self.output = VisImage(self._create_grayscale_image(keep_color))

        for i in range(len(boxes)):
            if not valid[i]:
                continue
            color = self._instance_color(int(classes[i]), i)
            if boxes.shape[-1] == 5:
                self.draw_rotated_box_with_label(
                    boxes[i],
                    color=color,
                    label=f"{self._class_name(int(classes[i]))} {scores[i]:.0%}",
                )
                continue
            self.draw_box(boxes[i], color=color)
            label = f"{self._class_name(int(classes[i]))} {scores[i]:.0%}"
            self.draw_text(label, (boxes[i][0], boxes[i][1]), color=color)
            if masks is not None:
                m = np.asarray(masks[i])
                if m.shape == (h, w):
                    self.draw_binary_mask(m > 0.5, color=color)
                else:
                    from ..evaluation.coco_evaluation import _paste_mask_np

                    full = _paste_mask_np(m.astype(np.float32), boxes[i], h, w)
                    self.draw_binary_mask(full, color=color)
            if "keypoints" in predictions:
                self.draw_keypoints(np.asarray(predictions["keypoints"][i]), color=color)
        return self.output

    def draw_sem_seg(self, sem_seg: np.ndarray, alpha: float = 0.5):
        sem_seg = np.asarray(sem_seg)
        labels = np.unique(sem_seg)
        stuff_colors = self.metadata.get("stuff_colors")
        for label in labels:
            if stuff_colors and int(label) < len(stuff_colors):
                color = tuple(int(c) for c in stuff_colors[int(label)])
            else:
                color = tuple(int(c) for c in _COLORS[int(label) % len(_COLORS)])
            self.draw_binary_mask(
                sem_seg == label,
                color=color,
                alpha=alpha,
                edge=False,
                text=self._class_name(int(label), "stuff"),
            )
        return self.output

    def draw_panoptic_seg(self, panoptic_seg: np.ndarray, segments_info: List[dict]):
        panoptic_seg = np.asarray(panoptic_seg)
        for idx, seg in enumerate(segments_info):
            base = _COLORS[seg["category_id"] % len(_COLORS)]
            color = _jitter(base, seed=idx) if seg.get("isthing") else tuple(int(c) for c in base)
            mask = panoptic_seg == seg["id"]
            kind = "thing" if seg.get("isthing") else "stuff"
            self.draw_binary_mask(
                mask, color=color, text=self._class_name(seg["category_id"], kind)
            )
        return self.output

    def draw_dataset_dict(self, dic: dict):
        """Visualize a dataset dict's gt annotations: boxes (axis-aligned or
        rotated), polygon/RLE segmentations, keypoints, and the sem-seg file
        (reference ``draw_dataset_dict``)."""
        from ..structures import BoxMode

        for idx, ann in enumerate(dic.get("annotations", [])):
            base = _COLORS[ann.get("category_id", 0) % len(_COLORS)]
            color = _jitter(base, seed=idx)
            mode = ann.get("bbox_mode", BoxMode.XYWH_ABS)
            if mode == getattr(BoxMode, "XYWHA_ABS", None):
                self.draw_rotated_box_with_label(
                    ann["bbox"], color=color,
                    label=self._class_name(ann.get("category_id", 0)),
                )
            elif "bbox" in ann:
                box = BoxMode.convert(ann["bbox"], mode, BoxMode.XYXY_ABS)
                self.draw_box(box, color=color)
                self.draw_text(
                    self._class_name(ann.get("category_id", 0)), (box[0], box[1]), color
                )
            seg = ann.get("segmentation")
            if isinstance(seg, list):  # polygons
                for poly in seg:
                    self.draw_polygon(poly, color=color)
            elif isinstance(seg, dict) and "counts" in seg:  # RLE
                from ..data.rle import decode_segmentation

                try:
                    h, w = seg.get("size", self.img.shape[:2])
                    self.draw_binary_mask(
                        decode_segmentation(seg, h, w), color=color
                    )
                except Exception:
                    pass
            if "keypoints" in ann:
                kps = np.asarray(ann["keypoints"], np.float64).reshape(-1, 3)
                self.draw_keypoints(kps[kps[:, 2] > 0], color=color)
        sem_file = dic.get("sem_seg_file_name")
        if sem_file:
            try:
                self.draw_sem_seg(np.asarray(Image.open(sem_file)))
            except Exception:
                pass
        if "pan_seg_file_name" in dic and "segments_info" in dic:
            try:
                from ..evaluation.panoptic_evaluation import rgb2id

                pan = rgb2id(np.asarray(Image.open(dic["pan_seg_file_name"])))
                self.draw_panoptic_seg(pan, dic["segments_info"])
            except Exception:
                pass
        return self.output

    def get_output(self) -> VisImage:
        return self.output
