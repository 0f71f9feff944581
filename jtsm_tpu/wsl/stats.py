"""CPG/CSC training statistics (reference
projects/WSL/wsl/modeling/roi_heads/third_party/cpg_stats.py ``Statistic``).

The reference accumulates, per class, how often an image label is present,
how often the MIL image score exceeds ``tau``, and how many proposals the
CSC op marks positive / negative / zero — then periodically logs the
running fractions and dumps a final npz. Here the accumulation is a plain
host-side ``EventWriter`` fed numpy arrays pulled out of the jitted step's
auxiliary outputs (CSC weights are returned from ``wsod_zoo.csc`` /
``csc_weighted_mil_image_loss`` aux rather than observed inside a CUDA op).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional

import numpy as np

from ..utils.events import EventWriter

logger = logging.getLogger(__name__)


class CSCStatistic(EventWriter):
    """Accumulate per-class label / prediction / CSC-proposal statistics.

    ``update`` is called once per step with host numpy arrays; ``write``
    (driven by ``PeriodicWriter``) logs running fractions every
    ``log_period`` updates; ``close`` dumps the final counters to
    ``{output_dir}/{prefix}_stats.json``.
    """

    def __init__(
        self,
        max_iter: int,
        tau: float,
        num_classes: int,
        output_dir: Optional[str] = None,
        prefix: str = "csc",
        log_period: int = 1280,
    ):
        self.max_iter = max_iter
        self.tau = tau
        self.num_classes = num_classes
        self.output_dir = output_dir
        self.prefix = prefix
        self.log_period = log_period
        self.cur_iter = 0
        self.num_images = 0

        z = lambda: np.zeros(num_classes, dtype=np.float64)
        self.label = z()  # images carrying class c
        self.pred = z()  # MIL image score >= tau
        self.csc_pred_pos = z()  # CSC kept the class positive
        self.num_roi = z()  # proposals considered for class c
        self.roi_pos = z()  # CSC positive proposals
        self.roi_neg = z()  # CSC negative proposals
        self.roi_zero = z()  # CSC zero-weight proposals

    def update(
        self,
        img_labels: np.ndarray,  # (B, C) 0/1
        img_preds: np.ndarray,  # (B, C) MIL image scores in [0, 1]
        csc_out: Optional[Dict[str, np.ndarray]] = None,
        # csc_out arrays are (B, C, R): pos_weight / neg_weight, plus
        # (B, R) proposal validity under key "valid".
    ) -> None:
        img_labels = np.asarray(img_labels, dtype=np.float64)
        img_preds = np.asarray(img_preds, dtype=np.float64)
        self.cur_iter += 1
        self.num_images += img_labels.shape[0]
        self.label += img_labels.sum(0)
        self.pred += ((img_preds >= self.tau) * img_labels).sum(0)
        if csc_out is not None:
            w_pos = np.asarray(csc_out["pos_weight"], dtype=np.float64)
            w_neg = np.asarray(csc_out["neg_weight"], dtype=np.float64)
            valid = np.asarray(csc_out["valid"], dtype=np.float64)[:, None, :]
            lab = img_labels[:, :, None]
            self.num_roi += (valid * lab).sum((0, 2))
            self.roi_pos += ((w_pos > 0) * valid * lab).sum((0, 2))
            self.roi_neg += ((w_neg > 0) * valid * lab).sum((0, 2))
            self.roi_zero += (
                ((w_pos == 0) & (w_neg == 0)) * valid * lab
            ).sum((0, 2))
            self.csc_pred_pos += ((w_pos.sum(-1) > 0) * img_labels).sum(0)

    def write(self) -> None:
        if self.cur_iter == 0 or self.cur_iter % self.log_period:
            return
        n = np.maximum(self.label, 1.0)
        r = np.maximum(self.num_roi, 1.0)
        logger.info(
            "%s stats @%d/%d: label/img %.3f  pred>=tau %.3f  "
            "csc_pos_img %.3f  roi pos/neg/zero %.3f/%.3f/%.3f",
            self.prefix,
            self.cur_iter,
            self.max_iter,
            float(self.label.sum() / max(self.num_images, 1)),
            float((self.pred / n).mean()),
            float((self.csc_pred_pos / n).mean()),
            float((self.roi_pos / r).mean()),
            float((self.roi_neg / r).mean()),
            float((self.roi_zero / r).mean()),
        )

    def close(self) -> None:
        if not self.output_dir:
            return
        path = os.path.join(self.output_dir, f"{self.prefix}_stats.json")
        os.makedirs(self.output_dir, exist_ok=True)
        with open(path, "w") as f:
            json.dump(
                {
                    k: getattr(self, k).tolist()
                    for k in (
                        "label",
                        "pred",
                        "csc_pred_pos",
                        "num_roi",
                        "roi_pos",
                        "roi_neg",
                        "roi_zero",
                    )
                }
                | {"cur_iter": self.cur_iter, "tau": self.tau},
                f,
            )
