"""Evaluator interfaces + inference loop (reference:
detectron2/evaluation/evaluator.py:13 ``DatasetEvaluator``, :64
``DatasetEvaluators``, :101 ``inference_on_dataset``)."""

from __future__ import annotations

import datetime
import logging
import time
from collections import OrderedDict
from typing import Callable, List, Optional

import numpy as np

from ..utils import comm
from ..utils.logger import log_every_n_seconds

logger = logging.getLogger(__name__)


class DatasetEvaluator:
    def reset(self):
        pass

    def process(self, inputs, outputs):
        pass

    def evaluate(self):
        pass


class DatasetEvaluators(DatasetEvaluator):
    def __init__(self, evaluators: List[DatasetEvaluator]):
        super().__init__()
        self._evaluators = evaluators

    def reset(self):
        for evaluator in self._evaluators:
            evaluator.reset()

    def process(self, inputs, outputs):
        for evaluator in self._evaluators:
            evaluator.process(inputs, outputs)

    def evaluate(self):
        results = OrderedDict()
        for evaluator in self._evaluators:
            result = evaluator.evaluate()
            if result is not None:
                for k, v in result.items():
                    assert k not in results, f"Different evaluators produce results with the same key {k}"
                    results[k] = v
        return results


def inference_on_dataset(
    predict_fn: Callable, data_loader, evaluator: Optional[DatasetEvaluator]
):
    """Run ``predict_fn(batch) -> outputs`` over the loader and feed the
    evaluator (reference evaluator.py:101 — same warmup/timing contract).

    ``predict_fn`` takes a static batch dict and returns a dict of numpy/JAX
    arrays (the batched detection format).
    """
    num_warmup = 5
    start_time = time.perf_counter()
    total_compute_time = 0.0
    total = 0
    if evaluator is None:
        evaluator = DatasetEvaluators([])
    evaluator.reset()

    for idx, inputs in enumerate(data_loader):
        if idx == num_warmup:
            start_time = time.perf_counter()
            total_compute_time = 0

        start_compute_time = time.perf_counter()
        outputs = predict_fn(inputs)
        # host-side postprocess products (panoptic_seg tuples, per-image
        # variable-size sem_seg maps) stay as lists; arrays go through asarray
        outputs = {
            k: (v if isinstance(v, (list, tuple)) else np.asarray(v))
            for k, v in outputs.items()
        }
        total_compute_time += time.perf_counter() - start_compute_time

        evaluator.process(inputs, outputs)
        total += inputs["image"].shape[0]

        iters_after_start = idx + 1 - num_warmup * int(idx >= num_warmup)
        seconds_per_img = total_compute_time / max(
            total - num_warmup * inputs["image"].shape[0], 1
        )
        if idx >= num_warmup * 2 or seconds_per_img > 5:
            eta = datetime.timedelta(seconds=0)
            log_every_n_seconds(
                logging.INFO,
                f"Inference done {idx + 1} batches. {seconds_per_img:.4f} s / img.",
                n=5,
            )

    total_time = time.perf_counter() - start_time
    logger.info(
        f"Total inference time: {datetime.timedelta(seconds=total_time)} "
        f"({total_time / max(total, 1):.6f} s / img per device)"
    )
    comm.synchronize()
    results = evaluator.evaluate()
    if results is None:
        results = {}
    return results


from contextlib import contextmanager


@contextmanager
def inference_context(model=None):
    """API-parity shim (reference evaluation/evaluator.py:86
    ``inference_context``): the torch version flips model.train/eval; jtsm
    models are functional — train/eval is the ``train=`` argument — so this
    is a no-op context kept for code written against the reference API."""
    yield model
