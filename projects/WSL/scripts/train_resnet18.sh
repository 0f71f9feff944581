#!/bin/bash
# ImageNet pretraining of the plain ResNet-18 baseline (conv stem).
set -xe
export PYTHONUNBUFFERED=True
EXP_DIR="output/resnet18_$(date +'%Y-%m-%d_%H-%M-%S')"
mkdir -p "${EXP_DIR}"
exec &> >(tee -a "${EXP_DIR}/train.log")
git log -1 || true
python projects/WSL/tools/imagenet.py \
  --arch resnet18 \
  --output "${EXP_DIR}" \
  --epochs 120 \
  --batch-size 256 \
  --lr 0.1 \
  "$@"
