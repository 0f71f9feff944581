#!/bin/bash -e
# Materialize the tiny COCO fixtures the quick_schedules configs use
# (coco_2017_val_100 + panoptic/stuff variants + keypoints).
#
# The reference downloads 100-image annotation subsets from
# dl.fbaipublicfiles.com; this environment is offline, so the fixtures are
# *generated*: dev/make_synthetic_coco.py fabricates images, instance/
# keypoint/panoptic annotations and stuff PNGs in the exact directory layout
# jtsm_tpu/data/datasets/builtin.py registers.

cd "${0%/*}/.."

ROOT=${JTSM_DATASETS:-datasets}
NUM=${1:-8}

if [[ -s "$ROOT/coco/annotations/instances_val2017_100.json" ]]; then
  echo "$ROOT/coco fixtures exist. Skipping ..."
else
  python dev/make_synthetic_coco.py --root "$ROOT" --num "$NUM"
fi
