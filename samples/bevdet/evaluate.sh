#!/usr/bin/env bash
set -e
DATA_ROOT=${DATA_ROOT:-data/nuscenes}
python tools/bevdet/evaluate.py \
  --infos "$DATA_ROOT/nuscenes_infos_temporal_val.pkl" --data-root "$DATA_ROOT" "$@"
