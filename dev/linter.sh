#!/bin/bash -e
# Lint (reference: dev/linter.sh uses black/isort/flake8).
python -m compileall -q jtsm_tpu tools demo projects || exit 1
echo "compileall passed"
if command -v ruff &> /dev/null; then
  ruff check jtsm_tpu
fi
