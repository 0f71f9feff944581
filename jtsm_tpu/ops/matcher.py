"""GT <-> prediction matching (reference: detectron2/modeling/matcher.py:8).

Fully vectorized; the reference's ``set_low_quality_matches_`` in-place
mutation becomes a pure ``jnp.where`` update.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

Array = jax.Array


class Matcher:
    """Assign each predicted element (column of the match matrix) to a GT row.

    thresholds/labels follow the reference convention, e.g. RPN uses
    thresholds=[0.3, 0.7], labels=[0, -1, 1].
    """

    def __init__(
        self,
        thresholds: List[float],
        labels: List[int],
        allow_low_quality_matches: bool = False,
    ):
        thresholds = list(thresholds)
        assert thresholds[0] > 0
        thresholds.insert(0, -float("inf"))
        thresholds.append(float("inf"))
        assert all(low <= high for (low, high) in zip(thresholds[:-1], thresholds[1:]))
        assert all(l in [-1, 0, 1] for l in labels)
        assert len(labels) == len(thresholds) - 1
        self.thresholds = thresholds
        self.labels = labels
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(self, match_quality_matrix: Array, gt_valid: Array | None = None):
        """match_quality_matrix: (M_gt, N_pred); gt_valid: (M_gt,) bool mask of
        real (non-padded) GT rows — the static-shape replacement for the
        reference's dynamic "0 gt" branch (matcher.py:8 forward).

        Returns (matches (N,), match_labels (N,) int8 in {-1, 0, 1}).
        """
        m, n = match_quality_matrix.shape
        if gt_valid is not None:
            neg = jnp.full_like(match_quality_matrix, -1.0)
            match_quality_matrix = jnp.where(
                gt_valid[:, None], match_quality_matrix, neg
            )

        matched_vals = jnp.max(match_quality_matrix, axis=0) if m > 0 else jnp.zeros((n,))
        matches = (
            jnp.argmax(match_quality_matrix, axis=0).astype(jnp.int32)
            if m > 0
            else jnp.zeros((n,), jnp.int32)
        )

        match_labels = jnp.full((n,), self.labels[0], dtype=jnp.int8)
        for (low, high), l in zip(
            zip(self.thresholds[:-1], self.thresholds[1:]), self.labels
        ):
            in_interval = (matched_vals >= low) & (matched_vals < high)
            match_labels = jnp.where(in_interval, jnp.int8(l), match_labels)

        if self.allow_low_quality_matches and m > 0:
            # For each (valid) gt, its best-overlap predictions get label 1
            # (reference matcher.py set_low_quality_matches_).
            highest_quality = jnp.max(match_quality_matrix, axis=1)  # (M,)
            is_best = match_quality_matrix == highest_quality[:, None]
            if gt_valid is not None:
                is_best = is_best & gt_valid[:, None] & (highest_quality[:, None] > 0)
            else:
                is_best = is_best & (highest_quality[:, None] > 0)
            pred_is_low_quality_match = jnp.any(is_best, axis=0)
            match_labels = jnp.where(
                pred_is_low_quality_match, jnp.int8(1), match_labels
            )

        return matches, match_labels
