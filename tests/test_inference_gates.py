"""Eval-only numerics gates over the COMMITTED fixture checkpoints.

Reference pattern: quick_schedules/*_inference_acc_test.yaml +
dev/run_inference_tests.sh — evaluate a FIXED pretrained model and assert
AP at +-0.02 (evaluation/testing.py:28 verify_results). The reference
points at zoo checkpoints; here each family evals a committed seeded tiny
model from tests/fixtures/gate_ckpts/ (built by
dev/make_inference_gate_ckpts.py), so the pins hold with zero downloads
and no training noise: they cover RPN decode, NMS, mask paste, the
panoptic fusion, the keypoint heatmap decode + OKS evaluator, the
DensePose IUV decode + GPS/GPSm evaluator, the WSL ensemble/no_paste
path, and every evaluator.

The full sweep (incl. shell-only tiers) lives in
dev/run_synthetic_acc_tests.sh; pytest drives every family with a
committed fixture.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(ROOT, "tests", "fixtures", "gate_ckpts")

_CORE = os.path.join(ROOT, "tools", "train_net.py")
CASES = [
    (
        "mask_rcnn",
        _CORE,
        os.path.join(
            ROOT,
            "configs/quick_schedules/mask_rcnn_R_18_FPN_synthetic_inference_acc_test.yaml",
        ),
    ),
    (
        "rpn",
        _CORE,
        os.path.join(
            ROOT, "configs/quick_schedules/rpn_R_18_synthetic_inference_acc_test.yaml"
        ),
    ),
    (
        "retinanet",
        _CORE,
        os.path.join(
            ROOT,
            "configs/quick_schedules/retinanet_R_18_synthetic_inference_acc_test.yaml",
        ),
    ),
    (
        "panoptic_fpn",
        _CORE,
        os.path.join(
            ROOT,
            "configs/quick_schedules/panoptic_fpn_R_18_synthetic_inference_acc_test.yaml",
        ),
    ),
    (
        "keypoint_rcnn",
        _CORE,
        os.path.join(
            ROOT,
            "configs/quick_schedules/keypoint_rcnn_R_18_synthetic_inference_acc_test.yaml",
        ),
    ),
    (
        "densepose",
        os.path.join(ROOT, "projects", "DensePose", "train_net.py"),
        os.path.join(
            ROOT,
            "projects/DensePose/configs/quick_schedules/densepose_rcnn_R_18_synthetic_inference_acc_test.yaml",
        ),
    ),
    (
        "jtsm",
        os.path.join(ROOT, "projects", "WSL", "tools", "train_net.py"),
        os.path.join(
            ROOT,
            "projects/WSL/configs/quick_schedules/jtsm_synthetic_inference_acc_test.yaml",
        ),
    ),
]


def _dataset_root():
    root = os.environ.get("JTSM_DATASETS", "/tmp/jtsm_synth_datasets")
    coco = os.path.join(root, "coco")
    cocovar = os.path.join(root, "cocovar")  # varied-stuff tree (jtsm gates)
    if not (os.path.isdir(coco) and os.path.isdir(cocovar)):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "dev", "make_synthetic_coco.py"),
             "--root", root, "--num", "8"],
            check=True,
        )
    return root


@pytest.mark.slow
@pytest.mark.parametrize("family,trainer,cfg", CASES, ids=[c[0] for c in CASES])
def test_inference_gate(family, trainer, cfg, tmp_path):
    ckpt = os.path.join(FIXDIR, f"{family}.ckpt.gz")
    assert os.path.exists(ckpt), (
        f"committed fixture missing: {ckpt} (regenerate with "
        "dev/make_inference_gate_ckpts.py)"
    )
    with open(cfg) as f:
        assert "EXPECTED_RESULTS: []" not in f.read(), (
            f"{cfg} has no pins — collect them with "
            "dev/make_inference_gate_ckpts.py and fill TEST.EXPECTED_RESULTS"
        )
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        JTSM_DATASETS=_dataset_root(),
        PYTHONPATH=ROOT,
    )
    # run from the repo root: MODEL.WEIGHTS in the yaml is repo-relative
    proc = subprocess.run(
        [sys.executable, trainer, "--eval-only", "--config-file", cfg,
         "OUTPUT_DIR", str(tmp_path)],
        cwd=ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
