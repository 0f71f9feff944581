#!/bin/bash
# Collect fresh gate numbers: run every synthetic quick-schedule gate
# (train + eval) on genuine CPU with the EXPECTED_RESULTS check disabled,
# logging each eval's printed metrics so the yaml pins can be updated.
# Usage: bash dev/repin_gates.sh [cfg ...]   (logs under /tmp/jtsm_repin)
export JAX_PLATFORMS=cpu
ROOT=$(cd "$(dirname "$0")/.." && pwd)
DATA=${JTSM_DATASETS:-/tmp/jtsm_synth_datasets}
export JTSM_DATASETS="$DATA"
rm -rf "$DATA"
python "$ROOT/dev/make_synthetic_coco.py" --root "$DATA" --num 8
LOGD=/tmp/jtsm_repin
mkdir -p "$LOGD"
CFG_LIST=( "${@:1}" )
if [[ ${#CFG_LIST[@]} -eq 0 ]]; then
  CFG_LIST=( "$ROOT"/configs/quick_schedules/*_synthetic_training_acc_test.yaml
             "$ROOT"/projects/WSL/configs/quick_schedules/*_synthetic_training_acc_test.yaml )
fi
for cfg in "${CFG_LIST[@]}"; do
  name=$(basename "$cfg" .yaml)
  case "$cfg" in
    *projects/WSL/*)       BIN="python $ROOT/projects/WSL/tools/train_net.py" ;;
    *projects/DensePose/*) BIN="python $ROOT/projects/DensePose/train_net.py" ;;
    *)                     BIN="python $ROOT/tools/train_net.py" ;;
  esac
  OUTPUT=/tmp/jtsm_repin_out/$name
  rm -rf "$OUTPUT"
  echo "=== $name train ==="
  $BIN --config-file "$cfg" OUTPUT_DIR "$OUTPUT" TEST.EXPECTED_RESULTS "[]" \
      > "$LOGD/$name.train.log" 2>&1 || { echo "TRAIN FAILED: $name"; continue; }
  echo "=== $name eval ==="
  $BIN --eval-only --config-file "$cfg" MODEL.WEIGHTS "$OUTPUT/model_final.ckpt" \
      OUTPUT_DIR "$OUTPUT" TEST.EXPECTED_RESULTS "[]" \
      > "$LOGD/$name.eval.log" 2>&1 || { echo "EVAL FAILED: $name"; continue; }
  echo "--- $name results ---"
  grep -E "copypaste|Evaluation results" "$LOGD/$name.eval.log" | tail -20
done
echo ALL_DONE
