"""Video visualization with cross-frame color consistency (reference:
detectron2/utils/video_visualizer.py — matches instances across frames by
IoU to keep colors stable)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .colormap import colormap
from .visualizer import Visualizer

_COLORS = colormap(rgb=True).astype(np.uint8)


class VideoVisualizer:
    def __init__(self, metadata=None, max_tracks: int = 256):
        self.metadata = metadata
        self._prev_boxes: Optional[np.ndarray] = None
        self._prev_colors: Optional[np.ndarray] = None
        self._next_color = 0
        self._max_tracks = max_tracks

    def _assign_colors(self, boxes: np.ndarray) -> np.ndarray:
        n = len(boxes)
        colors = np.zeros(n, np.int64)
        taken = set()
        if self._prev_boxes is not None and len(self._prev_boxes):
            from ..evaluation.coco_evaluation import _iou_np

            iou = _iou_np(boxes, self._prev_boxes)
            for i in range(n):
                j = int(iou[i].argmax()) if iou.shape[1] else -1
                if j >= 0 and iou[i, j] > 0.5 and int(self._prev_colors[j]) not in taken:
                    colors[i] = self._prev_colors[j]
                    taken.add(int(colors[i]))
                else:
                    colors[i] = -1
        else:
            colors[:] = -1
        for i in range(n):
            if colors[i] == -1:
                colors[i] = self._next_color % len(_COLORS)
                self._next_color += 1
        self._prev_boxes = boxes
        self._prev_colors = colors
        return colors

    def draw_instance_predictions(self, frame_rgb: np.ndarray, predictions: Dict):
        boxes = np.asarray(predictions["boxes"])
        valid = np.asarray(predictions.get("valid", np.ones(len(boxes), bool)))
        boxes_v = boxes[valid]
        colors = self._assign_colors(boxes_v)
        vis = Visualizer(frame_rgb, self.metadata)
        scores = np.asarray(predictions["scores"])[valid]
        classes = np.asarray(predictions["classes"])[valid]
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
