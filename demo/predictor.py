"""Visualization demo helpers (reference: demo/predictor.py:15
``VisualizationDemo``, :132 ``AsyncPredictor``).

TPU note: the reference's AsyncPredictor spawns one worker process per GPU;
here a thread pipelines host pre/post-processing against device execution
(one process drives the chip; jit dispatch is already async).
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np

from jtsm_tpu.data.catalog import MetadataCatalog
from jtsm_tpu.engine import DefaultPredictor
from jtsm_tpu.utils.visualizer import ColorMode, Visualizer


class VisualizationDemo:
    def __init__(self, cfg, instance_mode: ColorMode = ColorMode.IMAGE, parallel: bool = False):
        self.metadata = MetadataCatalog.get(
            cfg.DATASETS.TEST[0] if len(cfg.DATASETS.TEST) else "__unused"
        )
        self.instance_mode = instance_mode
        self.parallel = parallel
        if parallel:
            self.predictor = AsyncPredictor(cfg)
        else:
            self.predictor = DefaultPredictor(cfg)

    def run_on_image(self, image_bgr: np.ndarray):
        predictions = self.predictor(image_bgr)
        image_rgb = image_bgr[:, :, ::-1]
        visualizer = Visualizer(image_rgb, self.metadata, instance_mode=self.instance_mode)
        if "panoptic_seg" in predictions:
            pan, infos = predictions["panoptic_seg"]
            vis_output = visualizer.draw_panoptic_seg(pan, infos)
        elif "sem_seg" in predictions and "boxes" not in predictions:
            vis_output = visualizer.draw_sem_seg(predictions["sem_seg"])
        else:
            vis_output = visualizer.draw_instance_predictions(predictions)
        return predictions, vis_output

    def run_on_video(self, video):
        """Yields visualized frames from a cv2.VideoCapture. Uses ONE
        VideoVisualizer across frames so instance colors are tracked and
        stable (reference demo/predictor.py:89-116)."""
        import cv2

        from jtsm_tpu.utils.video_visualizer import VideoVisualizer

        video_vis = VideoVisualizer(self.metadata)
        while video.isOpened():
            success, frame = video.read()
            if not success:
                break
            predictions = self.predictor(frame)
            frame_rgb = frame[:, :, ::-1]
            if "panoptic_seg" in predictions:
                pan, infos = predictions["panoptic_seg"]
                vis = video_vis.draw_panoptic_seg_predictions(frame_rgb, pan, infos)
            elif "sem_seg" in predictions and "boxes" not in predictions:
                vis = video_vis.draw_sem_seg(frame_rgb, predictions["sem_seg"])
            else:
                vis = video_vis.draw_instance_predictions(frame_rgb, predictions)
            yield cv2.cvtColor(vis.get_image(), cv2.COLOR_RGB2BGR)


class AsyncPredictor:
    """Thread-pipelined predictor (see module docstring)."""

    def __init__(self, cfg, queue_size: int = 3):
        self._predictor = DefaultPredictor(cfg)
        self._task_queue: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._result_queue: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        self._put_idx = 0
        self._get_idx = 0

    def _worker(self):
        while True:
            idx, image = self._task_queue.get()
            if image is None:
                break
            self._result_queue.put((idx, self._predictor(image)))

    def put(self, image: np.ndarray):
        self._put_idx += 1
        self._task_queue.put((self._put_idx, image))

    def get(self):
        self._get_idx += 1
        idx, res = self._result_queue.get()
        return res

    def __call__(self, image: np.ndarray):
        self.put(image)
        return self.get()

    def shutdown(self):
        self._task_queue.put((None, None))
