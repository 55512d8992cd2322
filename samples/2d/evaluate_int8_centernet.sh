#!/usr/bin/env bash
# INT8 evaluation for CenterNet at calibrated scales
set -e
COCO_ROOT=${COCO_ROOT:-data/coco}
python tools/2d/evaluate.py centernet_r18 \
  --ann "$COCO_ROOT/annotations/instances_val2017.json" \
  --img-root "$COCO_ROOT/val2017" --batch 32 \
  --quant-scales checkpoints/centernet_r18_scales.msgpack --quant int8 "$@"
