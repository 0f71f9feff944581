#!/bin/bash
# Round-5: re-collect the eval-only inference-gate numbers for the core
# families under the current code (the round's detector_postprocess
# empty-box filter + RetinaNet NMS/anchor fixes can shift pins).
set -e
export JAX_PLATFORMS=cpu
export JTSM_DATASETS=/tmp/jtsm_kp_data   # tree already generated (hash-stable)
ROOT=$(cd "$(dirname "$0")/.." && pwd)
cd "$ROOT"
for fam in mask_rcnn rpn retinanet panoptic_fpn keypoint_rcnn; do
  case $fam in
    mask_rcnn) cfg=configs/quick_schedules/mask_rcnn_R_18_FPN_synthetic_inference_acc_test.yaml;;
    rpn) cfg=configs/quick_schedules/rpn_R_18_synthetic_inference_acc_test.yaml;;
    retinanet) cfg=configs/quick_schedules/retinanet_R_18_synthetic_inference_acc_test.yaml;;
    panoptic_fpn) cfg=configs/quick_schedules/panoptic_fpn_R_18_synthetic_inference_acc_test.yaml;;
    keypoint_rcnn) cfg=configs/quick_schedules/keypoint_rcnn_R_18_synthetic_inference_acc_test.yaml;;
  esac
  echo "=== $fam ==="
  python tools/train_net.py --eval-only --config-file "$cfg" \
      OUTPUT_DIR "/tmp/jtsm_gate_sweep/$fam" TEST.EXPECTED_RESULTS "[]" \
      2>&1 | grep -E "copypaste" | tail -8
done
echo ===SWEEP_DONE===
