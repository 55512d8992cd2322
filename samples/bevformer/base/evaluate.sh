#!/usr/bin/env bash
# FP/bf16 evaluation on nuScenes val (reference: samples/bevformer/base/*evaluate*.sh)
set -e
DATA_ROOT=${DATA_ROOT:-data/nuscenes}
python tools/bevformer/evaluate.py base \
  --infos "$DATA_ROOT/nuscenes_infos_temporal_val.pkl" \
  --data-root "$DATA_ROOT" --dtype bfloat16 "$@"
