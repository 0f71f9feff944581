#!/bin/bash
# Round-5 one-shot: collect the DensePose synthetic-gate pins on genuine CPU
# (VERDICT r4 item 3). Trains the 400-iter gate once, evals it (prints the
# numbers for the training-gate EXPECTED_RESULTS), then strips the final
# checkpoint into the committed f16 inference-gate fixture and evals THAT
# (prints the numbers for the inference-gate EXPECTED_RESULTS).
set -e
export JAX_PLATFORMS=cpu
export JTSM_DATASETS=/tmp/jtsm_dp_data
ROOT=$(cd "$(dirname "$0")/.." && pwd)
cd "$ROOT"
CFG=projects/DensePose/configs/quick_schedules/densepose_rcnn_R_18_synthetic_training_acc_test.yaml
ICFG=projects/DensePose/configs/quick_schedules/densepose_rcnn_R_18_synthetic_inference_acc_test.yaml
OUT=/tmp/jtsm_repin_out/densepose_gate
python dev/make_synthetic_coco.py --root "$JTSM_DATASETS" --num 8
rm -rf "$OUT"
python projects/DensePose/train_net.py --config-file "$CFG" \
    OUTPUT_DIR "$OUT" TEST.EXPECTED_RESULTS "[]"
echo ===TRAIN_DONE===
python projects/DensePose/train_net.py --eval-only --config-file "$CFG" \
    MODEL.WEIGHTS "$OUT/model_final.ckpt" OUTPUT_DIR "$OUT" \
    TEST.EXPECTED_RESULTS "[]"
echo ===TRAIN_GATE_EVAL_DONE===
python - <<'EOF'
import sys
sys.path.insert(0, ".")
from dev.make_inference_gate_ckpts import strip_to_fixture
strip_to_fixture("/tmp/jtsm_repin_out/densepose_gate/model_final.ckpt",
                 "tests/fixtures/gate_ckpts/densepose.ckpt.gz")
EOF
python projects/DensePose/train_net.py --eval-only --config-file "$ICFG" \
    OUTPUT_DIR "$OUT/fixture_eval" TEST.EXPECTED_RESULTS "[]"
echo ===FIXTURE_EVAL_DONE===
