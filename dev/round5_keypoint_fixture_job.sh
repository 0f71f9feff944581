#!/bin/bash
# Round-5 one-shot: rebuild the keypoint inference-gate fixture on the FULL
# 400-iter schedule (VERDICT r4 weak item 1 / advice item 1) so its pinned
# keypoint AP is meaningfully above the tolerance band, then print the
# fresh eval numbers to pin.
set -e
export JAX_PLATFORMS=cpu
export JTSM_DATASETS=/tmp/jtsm_kp_data
ROOT=$(cd "$(dirname "$0")/.." && pwd)
cd "$ROOT"
python dev/make_synthetic_coco.py --root "$JTSM_DATASETS" --num 8
python dev/make_inference_gate_ckpts.py keypoint_rcnn
echo ===KEYPOINT_FIXTURE_DONE===
