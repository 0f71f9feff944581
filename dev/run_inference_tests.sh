#!/bin/bash -e
set -e  # the shebang's -e is ignored when invoked as `bash <script>`
# Evaluate pretrained models and verify expected AP
# (reference: dev/run_inference_tests.sh).
BIN="python tools/train_net.py"
OUTPUT="inference_test_output"
CFG_LIST=( "${@:1}" )
if [[ ${#CFG_LIST[@]} -eq 0 ]]; then
  CFG_LIST=( configs/quick_schedules/*inference_acc_test.yaml )
fi
for cfg in "${CFG_LIST[@]}"; do
  echo "========================================================================"
  echo "Running $cfg ..."
  echo "========================================================================"
  $BIN --eval-only --config-file "$cfg" OUTPUT_DIR "$OUTPUT"
  rm -rf "$OUTPUT"
done
