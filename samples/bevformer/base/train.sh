#!/usr/bin/env bash
# Training on the device mesh (reference: train.sh, DDP -> pjit)
set -e
DATA_ROOT=${DATA_ROOT:-data/nuscenes}
python tools/bevformer/train.py base \
  --infos "$DATA_ROOT/nuscenes_infos_temporal_train.pkl" \
  --data-root "$DATA_ROOT" --steps 20000 --out checkpoints/base.msgpack "$@"
