#!/usr/bin/env bash
# Build the deployable artifact (reference: pth2onnx.sh + onnx2trt.sh)
set -e
python tools/bevformer/export.py tiny \
  --checkpoint checkpoints/bevformer_tiny_epoch_24.pth \
  --quant-scales checkpoints/tiny_scales.msgpack --quant int8 \
  --out checkpoints/tiny_tpu --aot --autotune "$@"
