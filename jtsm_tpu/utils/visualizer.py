"""Drawing utilities (reference: detectron2/utils/visualizer.py ``Visualizer``
— boxes/masks/keypoints/panoptic overlays). PIL-based re-implementation of
the drawing surface (the reference uses matplotlib)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from ..data.catalog import MetadataCatalog
from .colormap import colormap

_COLORS = colormap(rgb=True).astype(np.uint8)


class VisImage:
    def __init__(self, img: np.ndarray):
        self.pil = Image.fromarray(img.astype(np.uint8))
        self.draw = ImageDraw.Draw(self.pil, "RGBA")

    def get_image(self) -> np.ndarray:
        return np.asarray(self.pil)

    def save(self, filepath: str) -> None:
        self.pil.save(filepath)


class Visualizer:
    def __init__(self, img_rgb: np.ndarray, metadata=None, scale: float = 1.0):
        self.img = np.asarray(img_rgb).clip(0, 255).astype(np.uint8)
        if self.img.ndim == 2:
            self.img = np.stack([self.img] * 3, axis=-1)
        self.metadata = metadata if metadata is not None else MetadataCatalog.get("__nonexist__")
        self.output = VisImage(self.img)

    def _class_name(self, cls_id: int, kind: str = "thing") -> str:
        names = self.metadata.get(f"{kind}_classes")
        if names and 0 <= cls_id < len(names):
            return names[cls_id]
        return str(cls_id)

    def draw_box(self, box, color=(0, 255, 0), width: int = 2):
        x0, y0, x1, y1 = [float(v) for v in box]
        self.output.draw.rectangle([x0, y0, x1, y1], outline=tuple(color), width=width)
        return self.output

    def draw_text(self, text: str, position, color=(255, 255, 255)):
        x, y = position
        self.output.draw.text((x, max(y - 10, 0)), text, fill=tuple(color))
        return self.output

    def draw_binary_mask(self, mask: np.ndarray, color=(0, 255, 0), alpha: float = 0.45):
        overlay = np.zeros((*mask.shape, 4), np.uint8)
        overlay[mask] = (*color, int(alpha * 255))
        self.output.pil.paste(
            Image.fromarray(overlay, "RGBA"), (0, 0), Image.fromarray(overlay, "RGBA")
        )
        self.output.draw = ImageDraw.Draw(self.output.pil, "RGBA")
        return self.output

    def draw_keypoints(self, keypoints: np.ndarray, color=(255, 0, 0), radius: int = 2):
        for x, y, *rest in np.asarray(keypoints):
            self.output.draw.ellipse(
                [x - radius, y - radius, x + radius, y + radius], fill=tuple(color)
            )
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

        for i in range(len(boxes)):
            if not valid[i]:
                continue
            color = tuple(int(c) for c in _COLORS[classes[i] % len(_COLORS)])
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
        return self.output

    def draw_sem_seg(self, sem_seg: np.ndarray, alpha: float = 0.5):
        sem_seg = np.asarray(sem_seg)
        labels = np.unique(sem_seg)
        for label in labels:
            color = tuple(int(c) for c in _COLORS[int(label) % len(_COLORS)])
            self.draw_binary_mask(sem_seg == label, color=color, alpha=alpha)
        return self.output

    def draw_panoptic_seg(self, panoptic_seg: np.ndarray, segments_info: List[dict]):
        panoptic_seg = np.asarray(panoptic_seg)
        for seg in segments_info:
            color = tuple(int(c) for c in _COLORS[seg["category_id"] % len(_COLORS)])
            mask = panoptic_seg == seg["id"]
            self.draw_binary_mask(mask, color=color)
            ys, xs = np.nonzero(mask)
            if len(ys):
                kind = "thing" if seg.get("isthing") else "stuff"
                self.draw_text(
                    self._class_name(seg["category_id"], kind), (xs.mean(), ys.mean())
                )
        return self.output

    def draw_dataset_dict(self, dic: dict):
        """Visualize a dataset dict's gt annotations."""
        for ann in dic.get("annotations", []):
            from ..structures import BoxMode

            box = BoxMode.convert(ann["bbox"], ann["bbox_mode"], BoxMode.XYXY_ABS)
            color = tuple(int(c) for c in _COLORS[ann["category_id"] % len(_COLORS)])
            self.draw_box(box, color=color)
            self.draw_text(self._class_name(ann["category_id"]), (box[0], box[1]), color)
        return self.output

    def get_output(self) -> VisImage:
        return self.output
