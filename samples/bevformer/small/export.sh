#!/usr/bin/env bash
# Build the deployable artifact (reference: pth2onnx.sh + onnx2trt.sh)
set -e
python tools/bevformer/export.py small \
  --checkpoint checkpoints/bevformer_small_epoch_24.pth \
  --quant-scales checkpoints/small_scales.msgpack --quant int8 \
  --out checkpoints/small_tpu --aot --autotune "$@"
