"""Data-loading entry points (reference: detectron2/data/build.py:209
``get_detection_dataset_dicts``, :348 ``build_detection_train_loader``, :414
``build_detection_test_loader``).

TPU re-design: loaders yield **static padded batches** (dicts of numpy
arrays with fixed shapes, see detection_utils.build_static_batch) instead of
lists of per-image dicts. An optional background thread prefetches while the
device computes (the reference uses torch DataLoader worker processes; this
image has one CPU core, so threads + simplicity win).
"""

from __future__ import annotations

import itertools
import logging
import os
import queue
import threading
from typing import Any, Callable, Iterator, List, Optional

import numpy as np

from ..config import CfgNode
from ..utils import comm
from .catalog import DatasetCatalog, MetadataCatalog
from .common import AspectRatioGroupedDataset, DatasetFromList, MapDataset
from .dataset_mapper import DatasetMapper
from .detection_utils import build_static_batch
from .samplers import InferenceSampler, RepeatFactorTrainingSampler, TrainingSampler

logger = logging.getLogger(__name__)


def filter_images_with_only_crowd_annotations(dataset_dicts):
    num_before = len(dataset_dicts)

    def valid(anns):
        return any(ann.get("iscrowd", 0) == 0 for ann in anns)

    dataset_dicts = [x for x in dataset_dicts if valid(x.get("annotations", []))]
    num_after = len(dataset_dicts)
    logger.info(
        f"Removed {num_before - num_after} images with no usable annotations. "
        f"{num_after} images left."
    )
    return dataset_dicts


def filter_images_with_few_keypoints(dataset_dicts, min_keypoints_per_image):
    num_before = len(dataset_dicts)

    def visible_keypoints_in_image(dic):
        return sum(
            (np.asarray(ann["keypoints"][2::3]) > 0).sum()
            for ann in dic["annotations"]
            if "keypoints" in ann
        )

    dataset_dicts = [
        x for x in dataset_dicts if visible_keypoints_in_image(x) >= min_keypoints_per_image
    ]
    num_after = len(dataset_dicts)
    logger.info(
        f"Removed {num_before - num_after} images with fewer than "
        f"{min_keypoints_per_image} keypoints."
    )
    return dataset_dicts


def load_proposals_into_dataset(dataset_dicts, proposal_file):
    """Reference build.py:166 — merge precomputed proposals (pickle)."""
    import pickle

    logger.info(f"Loading proposals from: {proposal_file}")
    # $VAR expansion lets configs reference the dataset root portably
    # (e.g. "$JTSM_DATASETS/coco/proposals.pkl")
    with open(os.path.expandvars(proposal_file), "rb") as f:
        proposals = pickle.load(f, encoding="latin1")

    rename_keys = {"indexes": "ids", "scores": "objectness_logits"}
    for key in rename_keys:
        if key in proposals:
            proposals[rename_keys[key]] = proposals.pop(key)

    img_ids = set({str(record["image_id"]) for record in dataset_dicts})
    id_to_index = {str(id): i for i, id in enumerate(proposals["ids"]) if str(id) in img_ids}

    from ..structures import BoxMode

    bbox_mode = BoxMode(proposals["bbox_mode"]) if "bbox_mode" in proposals else BoxMode.XYXY_ABS
    for record in dataset_dicts:
        i = id_to_index[str(record["image_id"])]
        boxes = proposals["boxes"][i]
        objectness_logits = proposals["objectness_logits"][i]
        record["proposal_boxes"] = boxes
        record["proposal_objectness_logits"] = objectness_logits
        record["proposal_bbox_mode"] = bbox_mode
    return dataset_dicts


def get_detection_dataset_dicts(
    names,
    filter_empty: bool = True,
    min_keypoints: int = 0,
    proposal_files=None,
    proposal_loader=None,
):
    """Reference build.py:209. ``proposal_loader`` lets projects substitute a
    richer pickle reader (the WSL loader also attaches superpixels)."""
    if isinstance(names, str):
        names = [names]
    assert len(names), names
    dataset_dicts = [DatasetCatalog.get(dataset_name) for dataset_name in names]
    for dataset_name, dicts in zip(names, dataset_dicts):
        assert len(dicts), f"Dataset '{dataset_name}' is empty!"

    if proposal_files is not None:
        assert len(names) == len(proposal_files)
        loader = proposal_loader or load_proposals_into_dataset
        dataset_dicts = [
            loader(dataset_i_dicts, proposal_file)
            for dataset_i_dicts, proposal_file in zip(dataset_dicts, proposal_files)
        ]

    dataset_dicts = list(itertools.chain.from_iterable(dataset_dicts))

    has_instances = "annotations" in dataset_dicts[0]
    if filter_empty and has_instances:
        dataset_dicts = filter_images_with_only_crowd_annotations(dataset_dicts)
    if min_keypoints > 0 and has_instances:
        dataset_dicts = filter_images_with_few_keypoints(dataset_dicts, min_keypoints)

    if has_instances:
        try:
            class_names = MetadataCatalog.get(names[0]).thing_classes
            print_instances_class_histogram(dataset_dicts, class_names)
        except AttributeError:  # class names are not available for this dataset
            pass
    return dataset_dicts


def print_instances_class_histogram(dataset_dicts, class_names) -> None:
    """Log a per-class instance-count table for the training set (reference
    build.py:157 — same table, minus the tabulate/termcolor dependency)."""
    num_classes = len(class_names)
    histogram = np.zeros((num_classes,), dtype=np.int64)
    for entry in dataset_dicts:
        classes = np.asarray(
            [
                x["category_id"]
                for x in entry.get("annotations", [])
                if not x.get("iscrowd", 0)
            ],
            dtype=np.int64,
        )
        if len(classes):
            assert classes.min() >= 0, f"Got an invalid category_id={classes.min()}"
            assert classes.max() < num_classes, (
                f"Got an invalid category_id={classes.max()} "
                f"for a dataset of {num_classes} classes"
            )
        histogram += np.bincount(classes, minlength=num_classes)

    def short_name(x):
        return x[:11] + ".." if len(x) > 13 else x

    rows = [
        f"| {short_name(class_names[i]):>13s} | {int(v):<10d} "
        for i, v in enumerate(histogram)
    ]
    n_cols = min(3, max(1, num_classes))
    lines = [
        "".join(rows[i : i + n_cols]) + "|" for i in range(0, len(rows), n_cols)
    ]
    total = int(histogram.sum())
    logger.info(
        f"Distribution of instances among all {num_classes} categories "
        f"(total {total}):\n" + "\n".join(lines)
    )


class StaticBatchLoader:
    """Iterates mapped per-image dicts -> static padded batches, with an
    optional background prefetch thread."""

    def __init__(
        self,
        dataset: MapDataset,
        sampler,
        batch_size: int,
        buckets,
        max_instances: int,
        mask_crop_size: int = 0,
        proposal_topk: int = 0,
        aspect_ratio_grouping: bool = True,
        prefetch: int = 2,
        infinite: bool = True,
        pad_final: bool = False,
        num_workers: int = 0,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.buckets = [tuple(b) for b in buckets]
        self.max_instances = max_instances
        self.mask_crop_size = mask_crop_size
        self.proposal_topk = proposal_topk
        self.aspect_ratio_grouping = aspect_ratio_grouping
        self.prefetch = prefetch
        self.infinite = infinite
        self.pad_final = pad_final
        self.num_workers = num_workers

    def _mapped_stream(self):
        if self.num_workers <= 0:
            for idx in self.sampler:
                yield self.dataset[idx]
            return
        # DATALOADER.NUM_WORKERS > 0: map with a thread pool (reference uses
        # torch DataLoader worker PROCESSES; here the mapper's hot work —
        # PIL/cv2 decode, numpy resize — releases the GIL, so threads
        # parallelize it without pickling the dataset). A bounded in-flight
        # deque keeps ordering deterministic (identical batches to the
        # sequential path) and memory bounded.
        import collections
        from concurrent.futures import ThreadPoolExecutor

        depth = max(self.num_workers * 2, self.batch_size)
        with ThreadPoolExecutor(self.num_workers) as ex:
            pending: "collections.deque" = collections.deque()
            try:
                for idx in self.sampler:
                    pending.append(ex.submit(self.dataset.__getitem__, idx))
                    if len(pending) >= depth:
                        yield pending.popleft().result()
                while pending:
                    yield pending.popleft().result()
            finally:
                for f in pending:
                    f.cancel()

    def _batches(self) -> Iterator[dict]:
        if self.aspect_ratio_grouping and self.infinite:
            grouped = AspectRatioGroupedDataset(self._mapped_stream(), self.batch_size)
            for group in grouped:
                yield self._collate(group)
        else:
            it = self._mapped_stream()
            while True:
                group = list(itertools.islice(it, self.batch_size))
                if not group:
                    return
                real = len(group)
                if self.pad_final and real < self.batch_size:
                    # keep the compiled batch shape static: repeat the last
                    # image; image_ids keeps only the real entries so the
                    # caller can trim outputs before the evaluators see them
                    group = group + [group[-1]] * (self.batch_size - real)
                batch = self._collate(group)
                if real < len(group):
                    batch["image_ids"] = batch["image_ids"][:real]
                yield batch

    def _collate(self, group: List[dict]) -> dict:
        batch = build_static_batch(
            group,
            self.buckets,
            self.max_instances,
            self.mask_crop_size,
            self.proposal_topk,
        )
        batch["image_ids"] = np.asarray(
            [g.get("image_id", -1) for g in group], dtype=np.int64
        )
        return batch

    def __iter__(self) -> Iterator[dict]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()

        def producer():
            try:
                for b in self._batches():
                    q.put(b)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            yield item

    def __len__(self):
        if self.infinite:
            raise TypeError("Infinite loader has no length")
        n = len(self.sampler)
        return (n + self.batch_size - 1) // self.batch_size


def build_batch_data_loader(
    dataset,
    sampler,
    total_batch_size: int,
    *,
    aspect_ratio_grouping: bool = True,
    buckets=((800, 1344), (1344, 800), (1024, 1024)),
    max_instances: int = 100,
    mask_crop_size: int = 0,
    proposal_topk: int = 0,
    infinite: bool = True,
    num_workers: int = 0,
):
    """Reference data/build.py:261 ``build_batch_data_loader``: batch a
    mapped dataset with a per-host share of ``total_batch_size``. TPU form:
    a StaticBatchLoader producing shape-bucketed padded batches instead of
    torch collation (aspect-ratio grouping keyed on the bucket list)."""
    world = comm.get_world_size()
    assert total_batch_size % world == 0, (
        f"Total batch size {total_batch_size} must be divisible by world size {world}"
    )
    return StaticBatchLoader(
        dataset,
        sampler,
        total_batch_size // world,
        buckets,
        max_instances,
        mask_crop_size=mask_crop_size,
        proposal_topk=proposal_topk,
        aspect_ratio_grouping=aspect_ratio_grouping,
        infinite=infinite,
        num_workers=num_workers,
    )


def build_detection_train_loader(
    cfg: CfgNode,
    mapper: Optional[Callable] = None,
    proposal_loader: Optional[Callable] = None,
):
    """Reference build.py:348. Per-host batch = total / process_count."""
    dataset_dicts = get_detection_dataset_dicts(
        cfg.DATASETS.TRAIN,
        filter_empty=cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS,
        min_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.MIN_KEYPOINTS_PER_IMAGE
        if cfg.MODEL.KEYPOINT_ON
        else 0,
        proposal_files=cfg.DATASETS.PROPOSAL_FILES_TRAIN
        if cfg.MODEL.LOAD_PROPOSALS
        else None,
        proposal_loader=proposal_loader,
    )
    dataset = DatasetFromList(dataset_dicts, copy=False)
    if mapper is None:
        mapper = DatasetMapper(cfg, True)
    dataset = MapDataset(dataset, mapper)

    sampler_name = cfg.DATALOADER.SAMPLER_TRAIN
    if sampler_name == "TrainingSampler":
        sampler = TrainingSampler(len(dataset))
    elif sampler_name == "RepeatFactorTrainingSampler":
        repeat_factors = RepeatFactorTrainingSampler.repeat_factors_from_category_frequency(
            dataset_dicts, cfg.DATALOADER.REPEAT_THRESHOLD
        )
        sampler = RepeatFactorTrainingSampler(repeat_factors)
    else:
        raise ValueError(f"Unknown training sampler: {sampler_name}")

    world = comm.get_world_size()
    total_batch = cfg.SOLVER.IMS_PER_BATCH
    assert total_batch % world == 0, (total_batch, world)
    return StaticBatchLoader(
        dataset,
        sampler,
        total_batch // world,
        cfg.TPU.IMAGE_BUCKETS,
        cfg.TPU.MAX_GT_INSTANCES,
        mask_crop_size=cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION * 4 if cfg.MODEL.MASK_ON else 0,
        proposal_topk=cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN
        if cfg.MODEL.LOAD_PROPOSALS
        else 0,
        aspect_ratio_grouping=cfg.DATALOADER.ASPECT_RATIO_GROUPING,
        infinite=True,
        num_workers=cfg.DATALOADER.NUM_WORKERS,
    )


def build_detection_test_loader(
    cfg: CfgNode,
    dataset_name: str,
    mapper: Optional[Callable] = None,
    batch_size: int = 1,
    proposal_loader: Optional[Callable] = None,
):
    """Reference build.py:414 (InferenceSampler, exact partition)."""
    dataset_dicts = get_detection_dataset_dicts(
        [dataset_name],
        filter_empty=False,
        proposal_files=[
            cfg.DATASETS.PROPOSAL_FILES_TEST[list(cfg.DATASETS.TEST).index(dataset_name)]
        ]
        if cfg.MODEL.LOAD_PROPOSALS
        else None,
        proposal_loader=proposal_loader,
    )
    dataset = DatasetFromList(dataset_dicts)
    if mapper is None:
        mapper = DatasetMapper(cfg, False)
    dataset = MapDataset(dataset, mapper)
    sampler = InferenceSampler(len(dataset))
    return StaticBatchLoader(
        dataset,
        sampler,
        batch_size,
        cfg.TPU.IMAGE_BUCKETS,
        max_instances=0,
        proposal_topk=cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST
        if cfg.MODEL.LOAD_PROPOSALS
        else 0,
        aspect_ratio_grouping=False,
        infinite=False,
        pad_final=batch_size > 1,
        num_workers=cfg.DATALOADER.NUM_WORKERS,
    )
