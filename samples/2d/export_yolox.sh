#!/usr/bin/env bash
# Export the YOLOX engine artifact (reference: yolox export_onnx + onnx2trt)
set -e
python tools/2d/export.py yolox_x --dtype bfloat16 --quant int8 \
  --out artifacts/yolox_x "$@"
