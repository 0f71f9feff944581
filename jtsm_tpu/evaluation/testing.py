"""Result printing/verification (reference: detectron2/evaluation/testing.py:10
``print_csv_format``, :28 ``verify_results``)."""

from __future__ import annotations

import logging
import pprint
import sys
from collections import OrderedDict
from collections.abc import Mapping

import numpy as np

logger = logging.getLogger(__name__)


def print_csv_format(results: Mapping) -> None:
    assert isinstance(results, Mapping) or not len(results), results
    for task, res in results.items():
        if isinstance(res, Mapping):
            important_res = [(k, v) for k, v in res.items() if "-" not in k]
            logger.info(f"copypaste: Task: {task}")
            logger.info("copypaste: " + ",".join([k[0] for k in important_res]))
            logger.info(
                "copypaste: " + ",".join([f"{k[1]:.4f}" for k in important_res])
            )
        else:
            logger.info(f"copypaste: {task}={res}")


def verify_results(cfg, results: Mapping) -> bool:
    expected_results = cfg.TEST.EXPECTED_RESULTS
    if not len(expected_results):
        return True

    ok = True
    for task, metric, expected, tolerance in expected_results:
        actual = results[task].get(metric, None)
        if actual is None:
            ok = False
            continue
        if not np.isfinite(actual):
            ok = False
            continue
        diff = abs(actual - expected)
        if diff > tolerance:
            ok = False

    logger = logging.getLogger(__name__)
    if not ok:
        logger.error("Result verification failed!")
        logger.error("Expected Results: " + str(expected_results))
        logger.error("Actual Results: " + pprint.pformat(results))
        # reference testing.py:58: a failed gate terminates the process so
        # dev/run_inference_tests.sh (bash -e) reports the failure
        sys.exit(1)
    logger.info("Results verification passed.")
    return ok


def flatten_results_dict(results: Mapping) -> dict:
    r = {}
    for k, v in results.items():
        if isinstance(v, Mapping):
            v = flatten_results_dict(v)
            for kk, vv in v.items():
                r[k + "/" + kk] = vv
        else:
            r[k] = v
    return r
