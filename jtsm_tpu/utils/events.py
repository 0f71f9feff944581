"""Training metrics plumbing (reference: detectron2/utils/events.py).

``EventStorage`` collects scalars during training; writers flush them to
console / json / tensorboard. Fresh implementation with the same API
surface: put_scalar(s), put_image, step, context-manager nesting,
median-smoothing hints.
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Optional

_CURRENT_STORAGE_STACK = []


def get_event_storage() -> "EventStorage":
    assert _CURRENT_STORAGE_STACK, (
        "get_event_storage() has to be called inside a 'with EventStorage(...)' context!"
    )
    return _CURRENT_STORAGE_STACK[-1]


def has_event_storage() -> bool:
    return bool(_CURRENT_STORAGE_STACK)


class HistoryBuffer:
    """Rolling scalar history with median/avg (fvcore HistoryBuffer analog)."""

    def __init__(self, max_length: int = 1000000):
        self._max_length = max_length
        self._data: list = []  # (value, iteration)
        self._count = 0
        self._global_avg = 0.0

    def update(self, value: float, iteration: Optional[float] = None):
        if iteration is None:
            iteration = self._count
        if len(self._data) == self._max_length:
            self._data.pop(0)
        self._data.append((value, iteration))
        self._count += 1
        self._global_avg += (value - self._global_avg) / self._count

    def latest(self):
        return self._data[-1][0]

    def median(self, window_size: int):
        import numpy as np

        return float(np.median([x[0] for x in self._data[-window_size:]]))

    def avg(self, window_size: int):
        import numpy as np

        return float(np.mean([x[0] for x in self._data[-window_size:]]))

    def global_avg(self):
        return self._global_avg

    def values(self):
        return list(self._data)


class EventStorage:
    """Reference: detectron2/utils/events.py:263."""

    def __init__(self, start_iter: int = 0):
        self._history = defaultdict(HistoryBuffer)
        self._smoothing_hints = {}
        self._latest_scalars = {}
        self._iter = start_iter
        self._current_prefix = ""
        self._vis_data = []
        self._histograms = []

    def put_image(self, img_name, img_tensor):
        self._vis_data.append((img_name, img_tensor, self._iter))

    def clear_images(self):
        self._vis_data = []

    def put_scalar(self, name, value, smoothing_hint: bool = True):
        name = self._current_prefix + name
        value = float(value)
        self._history[name].update(value, self._iter)
        self._latest_scalars[name] = (value, self._iter)
        existing = self._smoothing_hints.get(name)
        if existing is not None:
            assert existing == smoothing_hint, (
                f"Scalar {name} was put with inconsistent smoothing_hint"
            )
        else:
            self._smoothing_hints[name] = smoothing_hint

    def put_scalars(self, *, smoothing_hint=True, **kwargs):
        for k, v in kwargs.items():
            self.put_scalar(k, v, smoothing_hint=smoothing_hint)

    def put_histogram(self, hist_name, hist_tensor, bins=1000):
        self._histograms.append((hist_name, hist_tensor, self._iter))

    def clear_histograms(self):
        self._histograms = []

    def history(self, name) -> HistoryBuffer:
        ret = self._history.get(name)
        if ret is None:
            raise KeyError(f"No history metric available for {name}!")
        return ret

    def histories(self):
        return self._history

    def latest(self):
        return dict(self._latest_scalars)

    def latest_with_smoothing_hint(self, window_size: int = 20):
        result = {}
        for k, (v, itr) in self._latest_scalars.items():
            result[k] = (
                self._history[k].median(window_size)
                if self._smoothing_hints[k]
                else v,
                itr,
            )
        return result

    def smoothing_hints(self):
        return dict(self._smoothing_hints)

    def step(self):
        self._iter += 1

    @property
    def iter(self):
        return self._iter

    @iter.setter
    def iter(self, val):
        self._iter = int(val)

    @property
    def iteration(self):
        return self._iter

    @contextmanager
    def name_scope(self, name):
        old_prefix = self._current_prefix
        self._current_prefix = name.rstrip("/") + "/"
        yield
        self._current_prefix = old_prefix

    def __enter__(self):
        _CURRENT_STORAGE_STACK.append(self)
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        assert _CURRENT_STORAGE_STACK[-1] == self
        _CURRENT_STORAGE_STACK.pop()


class EventWriter:
    def write(self):
        raise NotImplementedError

    def close(self):
        pass


class JSONWriter(EventWriter):
    """Reference: events.py:49 — one json dict per line per flush."""

    def __init__(self, json_file: str, window_size: int = 20):
        os.makedirs(os.path.dirname(os.path.abspath(json_file)), exist_ok=True)
        self._file_handle = open(json_file, "a")
        self._window_size = window_size
        self._last_write = -1

    def write(self):
        storage = get_event_storage()
        to_save = defaultdict(dict)
        for k, (v, itr) in storage.latest_with_smoothing_hint(self._window_size).items():
            if itr <= self._last_write:
                continue
            to_save[itr][k] = v
        if to_save:
            self._last_write = max(to_save.keys())
        for itr, scalars_per_iter in sorted(to_save.items()):
            scalars_per_iter["iteration"] = itr
            self._file_handle.write(json.dumps(scalars_per_iter, sort_keys=True) + "\n")
        self._file_handle.flush()
        try:
            os.fsync(self._file_handle.fileno())
        except AttributeError:
            pass

    def close(self):
        self._file_handle.close()


class CommonMetricPrinter(EventWriter):
    """Console writer with ETA (reference: events.py:180)."""

    def __init__(self, max_iter: Optional[int] = None, window_size: int = 20):
        self.logger = logging.getLogger("jtsm_tpu.utils.events")
        self._max_iter = max_iter
        self._window_size = window_size
        self._last_write = None

    def _get_eta(self, storage) -> Optional[str]:
        if self._max_iter is None:
            return None
        iteration = storage.iter
        try:
            eta_seconds = storage.history("time").median(1000) * (
                self._max_iter - iteration - 1
            )
            return str(datetime.timedelta(seconds=int(eta_seconds)))
        except KeyError:
            eta_string = None
            if self._last_write is not None:
                estimate_iter_time = (time.perf_counter() - self._last_write[1]) / (
                    iteration - self._last_write[0]
                )
                eta_seconds = estimate_iter_time * (self._max_iter - iteration - 1)
                eta_string = str(datetime.timedelta(seconds=int(eta_seconds)))
            self._last_write = (iteration, time.perf_counter())
            return eta_string

    def write(self):
        storage = get_event_storage()
        iteration = storage.iter
        if iteration == self._max_iter:
            return

        try:
            data_time = storage.history("data_time").avg(20)
        except KeyError:
            data_time = None
        try:
            iter_time = storage.history("time").global_avg()
        except KeyError:
            iter_time = None
        try:
            lr = "{:.5g}".format(storage.history("lr").latest())
        except KeyError:
            lr = "N/A"

        eta_string = self._get_eta(storage)
        losses = "  ".join(
            f"{k}: {v.median(self._window_size):.4g}"
            for k, v in storage.histories().items()
            if "loss" in k
        )
        self.logger.info(
            " {eta}iter: {iter}  {losses}  {time}{data_time}lr: {lr}".format(
                eta=f"eta: {eta_string}  " if eta_string else "",
                iter=iteration,
                losses=losses,
                time=f"time: {iter_time:.4f}  " if iter_time is not None else "",
                data_time=f"data_time: {data_time:.4f}  " if data_time is not None else "",
                lr=lr,
            )
        )


class TensorboardXWriter(EventWriter):
    """TensorBoard writer (reference: events.py:130); degrades to a no-op if
    tensorboard is unavailable in the image."""

    def __init__(self, log_dir: str, window_size: int = 20, **kwargs):
        self._window_size = window_size
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir, **kwargs)
        except Exception:
            logging.getLogger("jtsm_tpu.utils.events").warning(
                "tensorboard not available; TensorboardXWriter is a no-op"
            )
        self._last_write = -1

    def write(self):
        if self._writer is None:
            return
        storage = get_event_storage()
        new_last_write = self._last_write
        for k, (v, itr) in storage.latest_with_smoothing_hint(self._window_size).items():
            if itr > self._last_write:
                self._writer.add_scalar(k, v, itr)
                new_last_write = max(new_last_write, itr)
        self._last_write = new_last_write

    def close(self):
        if self._writer is not None:
            self._writer.close()
