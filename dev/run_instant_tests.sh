#!/bin/bash -e
set -e  # the shebang's -e is ignored when invoked as `bash <script>`
# Smoke-train every quick-schedule instant-test config for a few iterations
# (reference: dev/run_instant_tests.sh).
# Offline: `python dev/make_synthetic_coco.py` fabricates the
# coco_2017_val_100 / keypoints / panoptic trees these configs expect;
# add `MODEL.WEIGHTS ""` when the pretrained URL is unreachable.
BIN="python tools/train_net.py"
OUTPUT="instant_test_output"
CFG_LIST=( "${@:1}" )
if [[ ${#CFG_LIST[@]} -eq 0 ]]; then
  CFG_LIST=( configs/quick_schedules/*instant_test.yaml )
fi
for cfg in "${CFG_LIST[@]}"; do
  echo "========================================================================"
  echo "Running $cfg ..."
  echo "========================================================================"
  $BIN --config-file "$cfg" \
    SOLVER.IMS_PER_BATCH 2 SOLVER.MAX_ITER 10 \
    OUTPUT_DIR "$OUTPUT"
  rm -rf "$OUTPUT"
done
