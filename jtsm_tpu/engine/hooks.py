"""Trainer hooks (reference: detectron2/engine/hooks.py:40 ``CallbackHook``,
:75 ``IterationTimer``, :147 ``PeriodicWriter``, :181
``PeriodicCheckpointer``, :200 ``LRScheduler``, :307 ``EvalHook``, :367
``PreciseBN``)."""

from __future__ import annotations

import datetime
import logging
import time
from typing import Callable, Optional

from ..evaluation.testing import flatten_results_dict
from ..utils.events import EventStorage, get_event_storage

logger = logging.getLogger(__name__)


class HookBase:
    trainer = None  # set by TrainerBase.register_hooks

    def before_train(self):
        pass

    def after_train(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        pass


class CallbackHook(HookBase):
    def __init__(self, *, before_train=None, after_train=None, before_step=None, after_step=None):
        self._before_train = before_train
        self._before_step = before_step
        self._after_step = after_step
        self._after_train = after_train

    def before_train(self):
        if self._before_train:
            self._before_train(self.trainer)

    def after_train(self):
        if self._after_train:
            self._after_train(self.trainer)

    def before_step(self):
        if self._before_step:
            self._before_step(self.trainer)

    def after_step(self):
        if self._after_step:
            self._after_step(self.trainer)


class IterationTimer(HookBase):
    """Reference hooks.py:75 — separates hook time from per-step time."""

    def __init__(self, warmup_iter: int = 3):
        self._warmup_iter = warmup_iter
        self._step_timer = time.perf_counter()
        self._start_time = time.perf_counter()
        self._total_timer_paused = 0.0

    def before_train(self):
        self._start_time = time.perf_counter()

    def after_train(self):
        total_time = time.perf_counter() - self._start_time
        num_iter = self.trainer.iter + 1 - self.trainer.start_iter - self._warmup_iter
        if num_iter > 0:
            logger.info(
                f"Total training time: {datetime.timedelta(seconds=int(total_time))} "
                f"({total_time / num_iter:.4f} s / it)"
            )

    def before_step(self):
        self._step_timer = time.perf_counter()

    def after_step(self):
        sec = time.perf_counter() - self._step_timer
        iter_done = self.trainer.iter - self.trainer.start_iter + 1
        if iter_done > self._warmup_iter:
            get_event_storage().put_scalar("time", sec, smoothing_hint=True)


class PeriodicWriter(HookBase):
    """Reference hooks.py:147."""

    def __init__(self, writers, period: int = 20):
        self._writers = writers
        self._period = period

    def after_step(self):
        if (self.trainer.iter + 1) % self._period == 0 or (
            self.trainer.iter == self.trainer.max_iter - 1
        ):
            for writer in self._writers:
                writer.write()

    def after_train(self):
        for writer in self._writers:
            writer.write()
            writer.close()


class PeriodicCheckpointerHook(HookBase):
    """Reference hooks.py:181 — wraps checkpoint.PeriodicCheckpointer."""

    def __init__(self, periodic_checkpointer):
        self._pc = periodic_checkpointer

    def before_train(self):
        self._pc.max_iter = self.trainer.max_iter

    def after_step(self):
        # trainer keeps the live variables in sync before saving
        self.trainer.sync_checkpointer()
        self._pc.step(self.trainer.iter)


class LRScheduler(HookBase):
    """Reference hooks.py:200 — here the schedule lives inside the optax
    chain, so this hook only logs the current lr."""

    def __init__(self, schedule_fn: Optional[Callable] = None):
        self._schedule_fn = schedule_fn

    def after_step(self):
        if self._schedule_fn is not None:
            lr = float(self._schedule_fn(self.trainer.iter))
            get_event_storage().put_scalar("lr", lr, smoothing_hint=False)


class EvalHook(HookBase):
    """Reference hooks.py:307."""

    def __init__(self, eval_period: int, eval_function: Callable):
        self._period = eval_period
        self._func = eval_function

    def _do_eval(self):
        results = self._func()
        if results:
            assert isinstance(results, dict), (
                f"Eval function must return a dict. Got {results} instead."
            )
            flattened_results = flatten_results_dict(results)
            for k, v in flattened_results.items():
                try:
                    v = float(v)
                    get_event_storage().put_scalar(k, v, smoothing_hint=False)
                except (ValueError, TypeError):
                    pass

    def after_step(self):
        next_iter = self.trainer.iter + 1
        if self._period > 0 and next_iter % self._period == 0:
            if next_iter != self.trainer.max_iter:
                self._do_eval()

    def after_train(self):
        if self.trainer.iter + 1 >= self.trainer.max_iter:
            self._do_eval()
        del self._func


class TPUProfiler(HookBase):
    """Reference hooks.py:243 ``AutogradProfiler`` — wraps chosen iterations
    in a profiler and dumps a trace. TPU re-design: ``jax.profiler`` traces
    (viewable in TensorBoard/XProf) instead of torch.autograd.profiler."""

    def __init__(self, enable_predicate, output_dir: str):
        self._enable_predicate = enable_predicate
        self._output_dir = output_dir
        self._active = False

    def before_step(self):
        if self._enable_predicate(self.trainer):
            import jax

            jax.profiler.start_trace(self._output_dir)
            self._active = True

    def after_step(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            logger.info(f"Profiler trace saved to {self._output_dir}")


class PreciseBN(HookBase):
    """Reference hooks.py:367. With NaiveSyncBatchNorm under pjit the batch
    statistics are already global; recomputing population stats amounts to
    running N forward steps with batch_stats mutable, which
    ``Trainer.update_precise_bn`` implements when enabled."""

    def __init__(self, period: int, num_iter: int = 200):
        self._period = period
        self._num_iter = num_iter

    def after_step(self):
        next_iter = self.trainer.iter + 1
        if self._period > 0 and next_iter % self._period == 0:
            if hasattr(self.trainer, "update_precise_bn"):
                self.trainer.update_precise_bn(self._num_iter)


class TrainingVisualizationHook(HookBase):
    """Every ``period`` steps, draw the first training image with its GT
    boxes and put it into EventStorage for the TensorBoard writer
    (reference meta_arch/rcnn.py ``visualize_training`` driven by
    cfg.VIS_PERIOD)."""

    def __init__(self, period: int):
        self._period = period

    def after_step(self):
        if self._period <= 0 or self.trainer.iter % self._period != 0:
            return
        batch = getattr(self.trainer, "last_batch", None)
        if batch is None or "image" not in batch:
            return
        import numpy as np

        from ..utils.visualizer import Visualizer

        # batches carry RAW pixel images (normalization happens inside the
        # model), so the first image is directly drawable
        img = np.clip(np.asarray(batch["image"][0]), 0, 255).astype(np.uint8)
        vis = Visualizer(img)
        if "gt_boxes" in batch:
            boxes = np.asarray(batch["gt_boxes"][0])
            valid = (
                np.asarray(batch["gt_valid"][0]).astype(bool)
                if "gt_valid" in batch
                else np.ones(len(boxes), bool)
            )
            vis.overlay_instances(boxes=boxes[valid])
        out = vis.get_output().get_image()
        # CHW layout like the reference put_image contract
        self.trainer.storage.put_image(
            "training_samples", np.transpose(out, (2, 0, 1))
        )
