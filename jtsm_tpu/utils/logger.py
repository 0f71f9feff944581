"""Logging setup (reference: detectron2/utils/logger.py).

Colored console + optional rank-0 file log; ``log_first_n`` /
``log_every_n_seconds`` helpers.
"""

from __future__ import annotations

import functools
import logging
import os
import sys
import time
from collections import Counter

_LOG_COUNTER: Counter = Counter()
_LOG_TIMER: dict = {}


class _ColorFormatter(logging.Formatter):
    GREY = "\x1b[38;20m"
    YELLOW = "\x1b[33;20m"
    RED = "\x1b[31;20m"
    RESET = "\x1b[0m"

    def format(self, record):
        msg = super().format(record)
        if record.levelno >= logging.ERROR:
            return self.RED + msg + self.RESET
        if record.levelno >= logging.WARNING:
            return self.YELLOW + msg + self.RESET
        return msg


@functools.lru_cache()
def setup_logger(
    output: str | None = None,
    distributed_rank: int = 0,
    *,
    color: bool = True,
    name: str = "jtsm_tpu",
    abbrev_name: str | None = None,
):
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False

    fmt = "[%(asctime)s %(name)s]: %(levelname)s %(message)s"
    datefmt = "%m/%d %H:%M:%S"

    if distributed_rank == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        formatter_cls = _ColorFormatter if color else logging.Formatter
        ch.setFormatter(formatter_cls(fmt, datefmt=datefmt))
        logger.addHandler(ch)

    if output is not None:
        if output.endswith(".txt") or output.endswith(".log"):
            filename = output
        else:
            filename = os.path.join(output, "log.txt")
        if distributed_rank > 0:
            filename = filename + f".rank{distributed_rank}"
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(logging.Formatter(fmt, datefmt=datefmt))
        logger.addHandler(fh)

    return logger


def log_first_n(lvl, msg, n=1, *, name=None, key="caller"):
    caller_frame = sys._getframe(1)
    caller_key = (caller_frame.f_code.co_filename, caller_frame.f_lineno)
    hash_key = caller_key if key == "caller" else (caller_key, msg)
    _LOG_COUNTER[hash_key] += 1
    if _LOG_COUNTER[hash_key] <= n:
        logging.getLogger(name or "jtsm_tpu").log(lvl, msg)


def log_every_n(lvl, msg, n=1, *, name=None):
    """Log once per n calls from the same call site (reference
    utils/logger.py:162)."""
    caller_frame = sys._getframe(1)
    key = (caller_frame.f_code.co_filename, caller_frame.f_lineno)
    _LOG_COUNTER[key] += 1
    if n == 1 or _LOG_COUNTER[key] % n == 1:
        logging.getLogger(name or "jtsm_tpu").log(lvl, msg)


def create_small_table(small_dict) -> str:
    """Render a {name: scalar} dict as a two-row table string (reference
    utils/logger.py:196 — used by evaluators to pretty-print results)."""
    keys = [str(k) for k in small_dict.keys()]
    values = [
        f"{v:.4f}" if isinstance(v, float) else str(v) for v in small_dict.values()
    ]
    widths = [max(len(k), len(v)) for k, v in zip(keys, values)]
    header = "| " + " | ".join(k.center(w) for k, w in zip(keys, widths)) + " |"
    sep = "|:" + ":|:".join("-" * w for w in widths) + ":|"
    row = "| " + " | ".join(v.center(w) for v, w in zip(values, widths)) + " |"
    return "\n".join([header, sep, row])


def log_every_n_seconds(lvl, msg, n=1, *, name=None):
    caller_frame = sys._getframe(1)
    key = (caller_frame.f_code.co_filename, caller_frame.f_lineno)
    last = _LOG_TIMER.get(key, None)
    now = time.time()
    if last is None or now - last >= n:
        logging.getLogger(name or "jtsm_tpu").log(lvl, msg)
        _LOG_TIMER[key] = now
