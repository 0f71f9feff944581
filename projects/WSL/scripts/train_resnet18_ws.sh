#!/bin/bash
# ImageNet pretraining of the WS-ResNet-18 backbone (max-pool stem) used by
# the DRN-WSOD / JTSM zoo. TPU-native pretrainer: projects/WSL/tools/imagenet.py
# (mesh data-parallel over all local devices). Extra args pass through.
set -xe
export PYTHONUNBUFFERED=True
EXP_DIR="output/resnet18_ws_$(date +'%Y-%m-%d_%H-%M-%S')"
mkdir -p "${EXP_DIR}"
exec &> >(tee -a "${EXP_DIR}/train.log")
git log -1 || true
python projects/WSL/tools/imagenet.py \
  --arch ws_resnet18 \
  --output "${EXP_DIR}" \
  --epochs 120 \
  --batch-size 256 \
  --lr 0.1 \
  "$@"
