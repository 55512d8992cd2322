#!/usr/bin/env bash
# FLOPs + parameter counts per model tier (reference: samples/get_flops_params.sh)
set -e
for m in tiny small base; do
  python tools/flops_params.py "$m" "$@"
done
