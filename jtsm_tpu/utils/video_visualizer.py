"""Video visualization with cross-frame color consistency (reference:
detectron2/utils/video_visualizer.py — naive tracking: old instances claim
their best same-label IoU match in the new frame and transfer their color;
unmatched old instances persist ``ttl`` frames in case the detector merely
missed them)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .colormap import colormap
from .visualizer import Visualizer

_COLORS = colormap(rgb=True).astype(np.uint8)


@dataclass
class _DetectedInstance:
    """Per-instance track state carried between frames (reference
    video_visualizer.py:15 ``_DetectedInstance``)."""

    label: int
    bbox: Optional[np.ndarray]
    color: Optional[int]  # index into _COLORS; None until assigned
    ttl: int


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    from ..evaluation.coco_evaluation import _iou_np

    return np.asarray(_iou_np(a, b), np.float32)


class VideoVisualizer:
    def __init__(self, metadata=None, max_tracks: int = 256, ttl: int = 8):
        self.metadata = metadata
        self._old_instances: List[_DetectedInstance] = []
        self._next_color = 0
        self._max_tracks = max_tracks
        self._ttl = ttl

    def _assign_colors(self, instances: List[_DetectedInstance]) -> np.ndarray:
        """Reference video_visualizer.py:180: IoU between OLD and NEW boxes,
        zeroed across differing labels; each old instance with IoU > 0.6
        transfers its color to its best new match; unmatched old instances
        age by one ttl and survive as ghosts for future frames."""
        old_boxes = np.asarray(
            [i.bbox for i in self._old_instances], np.float32
        ).reshape(-1, 4)
        new_boxes = np.asarray([i.bbox for i in instances], np.float32).reshape(-1, 4)
        ious = _iou_matrix(old_boxes, new_boxes)
        for oi, old in enumerate(self._old_instances):
            for ni, new in enumerate(instances):
                if old.label != new.label:
                    ious[oi, ni] = 0.0

        extra: List[_DetectedInstance] = []
        if ious.size:
            matched = ious.argmax(axis=1)
            best = ious.max(axis=1)
        else:
            matched = np.zeros(len(self._old_instances), np.int64)
            best = np.zeros(len(self._old_instances), np.float32)
        for oi, old in enumerate(self._old_instances):
            if best[oi] > 0.6 and instances[int(matched[oi])].color is None:
                instances[int(matched[oi])].color = old.color
                continue
            old.ttl -= 1
            if old.ttl > 0:
                extra.append(old)

        for inst in instances:
            if inst.color is None:
                inst.color = self._next_color % len(_COLORS)
                self._next_color += 1
        self._old_instances = (instances[:] + extra)[: self._max_tracks]
        return np.asarray([i.color for i in instances], np.int64)

    def draw_instance_predictions(self, frame_rgb: np.ndarray, predictions: Dict):
        boxes = np.asarray(predictions["boxes"])
        valid = np.asarray(predictions.get("valid", np.ones(len(boxes), bool)))
        boxes_v = boxes[valid]
        scores = np.asarray(predictions["scores"])[valid]
        classes = np.asarray(predictions["classes"])[valid]
        tracked = [
            _DetectedInstance(int(c), b.astype(np.float32), None, self._ttl)
            for c, b in zip(classes, boxes_v)
        ]
        colors = self._assign_colors(tracked)
        vis = Visualizer(frame_rgb, self.metadata)
        masks = predictions.get("masks")
        masks_v = np.asarray(masks)[valid] if masks is not None else None
        h, w = np.asarray(frame_rgb).shape[:2]
        for i, box in enumerate(boxes_v):
            color = tuple(int(c) for c in _COLORS[colors[i]])
            vis.draw_box(box, color=color)
            vis.draw_text(
                f"{vis._class_name(int(classes[i]))} {scores[i]:.0%}",
                (box[0], box[1]),
                color=color,
            )
            if masks_v is not None:
                m = np.asarray(masks_v[i])
                if m.shape != (h, w):
                    from ..evaluation.coco_evaluation import _paste_mask_np

                    m = _paste_mask_np(m.astype(np.float32), box, h, w)
                vis.draw_binary_mask(m > 0.5, color=color)
        return vis.get_output()

    def draw_sem_seg(self, frame_rgb: np.ndarray, sem_seg: np.ndarray):
        """Stuff colors come from metadata, so they are frame-stable without
        tracking (reference video_visualizer.py:112)."""
        vis = Visualizer(frame_rgb, self.metadata)
        vis.draw_sem_seg(np.asarray(sem_seg))
        return vis.get_output()

    def draw_panoptic_seg_predictions(
        self,
        frame_rgb: np.ndarray,
        panoptic_seg: np.ndarray,
        segments_info: List[dict],
    ):
        """Reference video_visualizer.py:124: stuff drawn as sem-seg overlay;
        thing segments tracked by mask-derived boxes so instance colors stay
        stable across frames."""
        panoptic_seg = np.asarray(panoptic_seg)
        vis = Visualizer(frame_rgb, self.metadata)
        things, stuff = [], []
        for info in segments_info:
            (things if info.get("isthing") else stuff).append(info)
        for info in stuff:
            mask = panoptic_seg == info["id"]
            stuff_colors = getattr(self.metadata, "stuff_colors", None) or []
            cat = int(info.get("category_id", 0))
            color = (
                tuple(stuff_colors[cat]) if cat < len(stuff_colors) else (128, 128, 128)
            )
            vis.draw_binary_mask(mask, color=color)

        tracked: List[_DetectedInstance] = []
        masks = []
        for info in things:
            mask = panoptic_seg == info["id"]
            ys, xs = np.nonzero(mask)
            if len(ys) == 0:
                continue
            bbox = np.asarray(
                [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float32
            )
            tracked.append(
                _DetectedInstance(int(info.get("category_id", 0)), bbox, None, self._ttl)
            )
            masks.append(mask)
        if tracked:
            colors = self._assign_colors(tracked)
            for inst, mask, ci in zip(tracked, masks, colors):
                color = tuple(int(c) for c in _COLORS[ci])
                vis.draw_binary_mask(mask, color=color)
                vis.draw_text(
                    vis._class_name(inst.label),
                    (inst.bbox[0], inst.bbox[1]),
                    color=color,
                )
        return vis.get_output()
