#!/usr/bin/env bash
# INT8 evaluation at the calibrated scales (reference: bevdet evaluate_trt.sh)
set -e
DATA_ROOT=${DATA_ROOT:-data/nuscenes}
python tools/bevdet/evaluate.py \
  --infos "$DATA_ROOT/nuscenes_infos_val.pkl" \
  --data-root "$DATA_ROOT" --quant-scales checkpoints/bevdet_scales.msgpack "$@"
