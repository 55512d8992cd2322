#!/usr/bin/env bash
set -e
COCO_ROOT=${COCO_ROOT:-data/coco}
python tools/2d/evaluate.py yolox_x \
  --ann "$COCO_ROOT/annotations/instances_val2017.json" \
  --img-root "$COCO_ROOT/val2017" --batch 32 "$@"
