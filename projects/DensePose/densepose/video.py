"""Video / image-list datasets + frame selection (reference:
projects/DensePose/densepose/data/video/{frame_selector.py,
video_keyframe_dataset.py} and data/image_list_dataset.py,
data/inference_based_loader.py, data/combined_loader.py).

Host-side data plumbing for the bootstrapping pipelines: pick keyframes
from videos (cv2), batch image lists, run a model to generate pseudo-GT
with a PredictionToGroundTruthSampler, and round-robin-combine loaders.
"""

from __future__ import annotations

import random
from collections import deque
from enum import Enum
from typing import Any, Callable, Iterable, Iterator, List, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


# ---------------------------------------------------------------------------
# frame selection (reference video/frame_selector.py)
# ---------------------------------------------------------------------------


class FrameSelectionStrategy(Enum):
    RANDOM_K = "random_k"
    FIRST_K = "first_k"
    LAST_K = "last_k"
    ALL = "all"


class RandomKFramesSelector:
    def __init__(self, k: int):
        self.k = k

    def __call__(self, frame_ids: List[int]) -> List[int]:
        return random.sample(frame_ids, min(self.k, len(frame_ids)))


class FirstKFramesSelector:
    def __init__(self, k: int):
        self.k = k

    def __call__(self, frame_ids: List[int]) -> List[int]:
        return frame_ids[: self.k]


class LastKFramesSelector:
    def __init__(self, k: int):
        self.k = k

    def __call__(self, frame_ids: List[int]) -> List[int]:
        return frame_ids[-self.k :]


def frame_selector_from_strategy(strategy: FrameSelectionStrategy, k: int = 1):
    return {
        FrameSelectionStrategy.RANDOM_K: RandomKFramesSelector(k),
        FrameSelectionStrategy.FIRST_K: FirstKFramesSelector(k),
        FrameSelectionStrategy.LAST_K: LastKFramesSelector(k),
        FrameSelectionStrategy.ALL: lambda ids: ids,
    }[strategy]


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------


def list_keyframes(video_fpath: str) -> List[int]:
    """Indices of (approximate) keyframes: every Nth frame (cv2 exposes no
    codec keyframe flags portably; the reference uses av's key_frame —
    every-Nth is the deterministic fallback)."""
    if cv2 is None:
        return []
    cap = cv2.VideoCapture(video_fpath)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    cap.release()
    step = max(int(round(fps)), 1)  # ~1 keyframe per second
    return list(range(0, n, step))


def read_keyframes(video_fpath: str, frame_ids: List[int]) -> List[np.ndarray]:
    if cv2 is None:
        return []
    cap = cv2.VideoCapture(video_fpath)
    frames = []
    for fid in frame_ids:
        cap.set(cv2.CAP_PROP_POS_FRAMES, fid)
        ok, frame = cap.read()
        if ok:
            frames.append(frame)
    cap.release()
    return frames


class VideoKeyframeDataset:
    """Keyframes from a list of videos (reference
    video_keyframe_dataset.py:28)."""

    def __init__(
        self,
        video_list: Sequence[str],
        frame_selector: Optional[Callable] = None,
        transform: Optional[Callable] = None,
    ):
        self.video_list = list(video_list)
        self.frame_selector = frame_selector or (lambda ids: ids)
        self.transform = transform

    def __len__(self) -> int:
        return len(self.video_list)

    def __getitem__(self, idx: int) -> List[np.ndarray]:
        fpath = self.video_list[idx]
        frame_ids = self.frame_selector(list_keyframes(fpath))
        frames = read_keyframes(fpath, frame_ids)
        if self.transform is not None:
            frames = [self.transform(f) for f in frames]
        return frames


class ImageListDataset:
    """Images from a list of file paths (reference image_list_dataset.py)."""

    def __init__(self, image_list: Sequence[str], transform: Optional[Callable] = None):
        self.image_list = list(image_list)
        self.transform = transform

    def __len__(self) -> int:
        return len(self.image_list)

    def __getitem__(self, idx: int) -> Optional[np.ndarray]:
        if cv2 is None:
            return None
        img = cv2.imread(self.image_list[idx])
        if img is not None and self.transform is not None:
            img = self.transform(img)
        return img


# ---------------------------------------------------------------------------
# loaders (reference inference_based_loader.py, combined_loader.py)
# ---------------------------------------------------------------------------


class InferenceBasedLoader:
    """Run a predictor over unlabeled images and emit pseudo-GT batches via a
    PredictionToGroundTruthSampler (reference inference_based_loader.py:24)."""

    def __init__(
        self,
        predictor: Callable[[np.ndarray], dict],
        data_loader: Iterable,
        data_sampler: Optional[Callable] = None,
        data_filter: Optional[Callable] = None,
        shuffle: bool = True,
        batch_size: int = 4,
    ):
        self.predictor = predictor
        self.data_loader = data_loader
        self.data_sampler = data_sampler
        self.data_filter = data_filter
        self.shuffle = shuffle
        self.batch_size = batch_size

    def __iter__(self) -> Iterator[List[Any]]:
        buffer: List[Any] = []
        for images in self.data_loader:
            if images is None:
                continue
            if not isinstance(images, (list, tuple)):
                images = [images]
            for image in images:
                if image is None:
                    continue
                outputs = self.predictor(image)
                sample = (
                    self.data_sampler(image, outputs)
                    if self.data_sampler is not None
                    else {"image": image, "outputs": outputs}
                )
                if self.data_filter is not None and not self.data_filter(sample):
                    continue
                buffer.append(sample)
                if len(buffer) >= self.batch_size:
                    if self.shuffle:
                        random.shuffle(buffer)
                    yield buffer
                    buffer = []
        if buffer:
            yield buffer


class CombinedDataLoader:
    """Combine several loaders with given sampling ratios (reference
    combined_loader.py:10): each batch is drawn from loader i with
    probability ratios[i]; exhausted loaders restart."""

    BATCH_COUNT = 100

    def __init__(self, loaders: Sequence[Iterable], batch_size: int, ratios: Sequence[float]):
        self.loaders = list(loaders)
        self.batch_size = batch_size
        self.ratios = list(ratios)

    def __iter__(self) -> Iterator[List[Any]]:
        iters = [iter(l) for l in self.loaders]
        indices: deque = deque()
        pool: List[Any] = []

        def prime():
            k = random.choices(
                range(len(self.loaders)), weights=self.ratios, k=self.BATCH_COUNT
            )
            indices.extend(k)

        while True:
            if not indices:
                prime()
            i = indices.popleft()
            try:
                batch = next(iters[i])
            except StopIteration:
                iters[i] = iter(self.loaders[i])
                try:
                    batch = next(iters[i])
                except StopIteration:
                    return
            yield batch
