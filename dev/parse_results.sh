#!/bin/bash
# Parse headline metrics from a training log (reference dev/parse_results.sh,
# adapted to this framework's log lines).
set -e
LOG="$1"
if [[ -z "$LOG" ]]; then
  echo "Usage: $0 /path/to/log.txt"
  exit 1
fi

# [.. engine.hooks]: INFO Total training time: 0:04:21 (0.8780 s / it)
trainspeed=$(grep -o 'Total training time.*' "$LOG" | tail -n1 | grep -Eo '\([0-9.]+ s / it\)' | grep -o '[0-9.]*' || true)
echo "Training speed: ${trainspeed:-n/a} s/it"

# [.. jtsm_tpu]: INFO Inference done N batches. X s / img.
inferencespeed=$(grep -o 'Inference done.*s / img' "$LOG" | tail -n1 | grep -Eo '[0-9.]+ s / img' | grep -o '^[0-9.]*' || true)
echo "Inference speed: ${inferencespeed:-n/a} s/img"

echo "Easy to copypaste:"
echo "${trainspeed:-n/a},${inferencespeed:-n/a}"

# final metric tables are already emitted in copypaste form:
grep 'copypaste:' "$LOG" | tail -n 20 || true
