#!/usr/bin/env bash
# Build the deployable artifact (reference: pth2onnx.sh + onnx2trt.sh)
set -e
python tools/bevformer/export.py base \
  --checkpoint checkpoints/bevformer_r101_dcn_24ep.pth \
  --quant-scales checkpoints/base_scales.msgpack --quant int8 \
  --out checkpoints/base_tpu --aot --autotune "$@"
# --autotune sweeps the sorted-MSDA kernel-layout grid at the deploy shapes
# on this chip and bakes + persists the winner (knobs.json) — the
# reference's build-time cuBLAS algo search serialized into the engine
