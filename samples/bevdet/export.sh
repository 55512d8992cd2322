#!/usr/bin/env bash
# Export the BEVDet engine artifact (StableHLO + AOT + baked rig ranks)
# (reference: bevdet export_onnx.py + onnx2trt.sh)
set -e
python tools/bevdet/export.py --model r50 --dtype bfloat16 --quant int8 \
  --out artifacts/bevdet_r50 "$@"
