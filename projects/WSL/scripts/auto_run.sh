#!/bin/bash
# Retry wrapper for long training runs: re-launches the given command until
# it exits 0 (training resumes from last_checkpoint via --resume; reference
# counterpart scripts/auto_run.sh). Usage:
#   bash projects/WSL/scripts/auto_run.sh python projects/WSL/tools/train_net.py --resume --config-file ...
set -x
CMD=( "$@" )
until "${CMD[@]}"; do
  echo "Command failed (exit $?); retrying in 10s ..."
  sleep 10
done
