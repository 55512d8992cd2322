#!/usr/bin/env bash
# INT8 PTQ calibration -> scale dict (reference: onnx2trt.sh --int8)
set -e
DATA_ROOT=${DATA_ROOT:-data/nuscenes}
python tools/bevformer/calibrate.py tiny \
  --infos "$DATA_ROOT/nuscenes_infos_temporal_val.pkl" \
  --data-root "$DATA_ROOT" --length 500 --method percentile \
  --out checkpoints/tiny_scales.msgpack "$@"
