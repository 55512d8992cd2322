#!/usr/bin/env bash
# CenterNet training (reference: tools/2d/train.py + configs/centernet/
# centernet_resnet18_140e_coco.py; hsv/flip pipeline, gaussian focal loss)
set -e
COCO_ROOT=${COCO_ROOT:-data/coco}
python tools/2d/train.py centernet_r18 \
  --ann "$COCO_ROOT/annotations/instances_train2017.json" \
  --img-root "$COCO_ROOT/train2017" --batch 16 --steps 10000 \
  --out checkpoints/centernet_r18.msgpack "$@"
