#!/usr/bin/env bash
# INT8 evaluation for YOLOX at calibrated scales (reference int8 engine eval)
set -e
COCO_ROOT=${COCO_ROOT:-data/coco}
python tools/2d/evaluate.py yolox_x \
  --ann "$COCO_ROOT/annotations/instances_val2017.json" \
  --img-root "$COCO_ROOT/val2017" --batch 32 \
  --quant-scales checkpoints/yolox_x_scales.msgpack --quant int8 "$@"
