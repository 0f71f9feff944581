"""Build the committed checkpoints behind the *_synthetic_inference_acc_test
gates (reference pattern: quick_schedules/*_inference_acc_test.yaml, which
eval a FIXED pretrained model and pin AP at +-0.02 — far tighter than the
training gates, whose short-run numbers wobble with platform/XLA drift).

The reference points its inference gates at detectron2:// zoo checkpoints
(not downloadable here), so each family gets a few-MB seeded tiny model
trained once on the synthetic COCO tree and committed under
tests/fixtures/gate_ckpts/ (f16 params-only, gzipped; the checkpoint loader
upcasts f16 storage to f32 on load).

Usage (CPU, with the synthetic dataset present):
  JTSM_DATASETS=/tmp/jtsm_synth_datasets python dev/make_inference_gate_ckpts.py [family ...]

For each family this trains the inference-gate config (EXPECTED_RESULTS
disabled), converts the final checkpoint to the committed fixture, then
runs the eval-only gate and prints its numbers — paste those into the
yaml's TEST.EXPECTED_RESULTS.
"""

import gzip
import os
import pickle
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QS = os.path.join(ROOT, "configs", "quick_schedules")
WSL_QS = os.path.join(ROOT, "projects", "WSL", "configs", "quick_schedules")
FIXDIR = os.path.join(ROOT, "tests", "fixtures", "gate_ckpts")

DP_QS = os.path.join(ROOT, "projects", "DensePose", "configs", "quick_schedules")

FAMILIES = {
    "mask_rcnn": (os.path.join(QS, "mask_rcnn_R_18_FPN_synthetic_inference_acc_test.yaml"), "core"),
    "keypoint_rcnn": (os.path.join(QS, "keypoint_rcnn_R_18_synthetic_inference_acc_test.yaml"), "core"),
    "retinanet": (os.path.join(QS, "retinanet_R_18_synthetic_inference_acc_test.yaml"), "core"),
    "rpn": (os.path.join(QS, "rpn_R_18_synthetic_inference_acc_test.yaml"), "core"),
    "panoptic_fpn": (os.path.join(QS, "panoptic_fpn_R_18_synthetic_inference_acc_test.yaml"), "core"),
    "jtsm": (os.path.join(WSL_QS, "jtsm_synthetic_inference_acc_test.yaml"), "wsl"),
    "densepose": (os.path.join(DP_QS, "densepose_rcnn_R_18_synthetic_inference_acc_test.yaml"), "densepose"),
}

TRAINERS = {
    "core": os.path.join(ROOT, "tools", "train_net.py"),
    "wsl": os.path.join(ROOT, "projects", "WSL", "tools", "train_net.py"),
    "densepose": os.path.join(ROOT, "projects", "DensePose", "train_net.py"),
}


def strip_to_fixture(src_ckpt: str, dst: str) -> None:
    """model_final.ckpt (variables + opt_state + rng) -> f16 params-only
    gzipped fixture."""
    with open(src_ckpt, "rb") as f:
        data = pickle.load(f)
    vars_ = data["variables"]

    def f16(a):
        if isinstance(a, np.ndarray) and a.dtype == np.float32:
            return a.astype(np.float16)
        return a

    import jax

    small = jax.tree_util.tree_map(f16, vars_)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with gzip.open(dst, "wb") as f:
        pickle.dump({"variables": small}, f, protocol=4)
    print(f"fixture written: {dst} ({os.path.getsize(dst) / 1e6:.1f} MB)")


def run(family: str, cfg_path: str, kind: str) -> None:
    trainer = TRAINERS[kind]
    out = f"/tmp/jtsm_infer_gate_{family}"
    subprocess.run(
        [sys.executable, trainer, "--config-file", cfg_path,
         "OUTPUT_DIR", out, "TEST.EXPECTED_RESULTS", "[]",
         "MODEL.WEIGHTS", ""],
        check=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    dst = os.path.join(FIXDIR, f"{family}.ckpt.gz")
    strip_to_fixture(os.path.join(out, "model_final.ckpt"), dst)
    # eval the committed fixture exactly as the gate will (prints the
    # numbers to pin; EXPECTED_RESULTS disabled so a stale pin can't fail
    # this collection run)
    subprocess.run(
        [sys.executable, trainer, "--eval-only", "--config-file", cfg_path,
         "OUTPUT_DIR", out, "TEST.EXPECTED_RESULTS", "[]"],
        check=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )


def main():
    wanted = sys.argv[1:] or list(FAMILIES)
    for family in wanted:
        cfg_path, kind = FAMILIES[family]
        print(f"=== {family}: {cfg_path}")
        run(family, cfg_path, kind)


if __name__ == "__main__":
    main()
