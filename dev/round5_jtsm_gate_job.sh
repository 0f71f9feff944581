#!/bin/bash
# Round-5 one-shot: re-pin the JTSM gates on genuine CPU after (a) the
# reference-parity semantic alignment of the WSL mining/loss plane and
# (b) the varied-stuff cocovar fixture (VERDICT r4 items 1 + 6).
# Trains the 600-iter training gate (prints its pins), then rebuilds the
# committed inference-gate fixture and evals it (prints those pins).
set -e
export JAX_PLATFORMS=cpu
export JTSM_DATASETS=/tmp/jtsm_jtsm_data
ROOT=$(cd "$(dirname "$0")/.." && pwd)
cd "$ROOT"
CFG=projects/WSL/configs/quick_schedules/jtsm_synthetic_training_acc_test.yaml
OUT=/tmp/jtsm_repin_out/jtsm_gate
python dev/make_synthetic_coco.py --root "$JTSM_DATASETS" --num 8
rm -rf "$OUT"
python projects/WSL/tools/train_net.py --config-file "$CFG" \
    OUTPUT_DIR "$OUT" TEST.EXPECTED_RESULTS "[]"
echo ===TRAIN_DONE===
python projects/WSL/tools/train_net.py --eval-only --config-file "$CFG" \
    MODEL.WEIGHTS "$OUT/model_final.ckpt" OUTPUT_DIR "$OUT" \
    TEST.EXPECTED_RESULTS "[]"
echo ===TRAIN_GATE_EVAL_DONE===
python dev/make_inference_gate_ckpts.py jtsm
echo ===JTSM_FIXTURE_DONE===
