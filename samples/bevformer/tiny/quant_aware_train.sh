#!/usr/bin/env bash
# QAT fine-tune: 1 epoch, lr 1e-6, from PTQ scales (reference quant_aware_train.sh)
set -e
DATA_ROOT=${DATA_ROOT:-data/nuscenes}
python tools/bevformer/train.py tiny \
  --infos "$DATA_ROOT/nuscenes_infos_temporal_train.pkl" \
  --data-root "$DATA_ROOT" --quant-scales checkpoints/tiny_scales.msgpack \
  --steps 7000 --out checkpoints/tiny_qat.msgpack "$@"
