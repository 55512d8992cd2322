#!/usr/bin/env bash
# QAT fine-tune at the calibrated scales (reference: quant_aware_train.sh,
# 1-epoch tiny-lr recipe; mosaic/mixup stay on as in the reference QAT config)
set -e
COCO_ROOT=${COCO_ROOT:-data/coco}
python tools/2d/train.py yolox_x \
  --ann "$COCO_ROOT/annotations/instances_train2017.json" \
  --img-root "$COCO_ROOT/train2017" --batch 8 --steps 14786 \
  --quant-scales checkpoints/yolox_x_scales.msgpack \
  --checkpoint checkpoints/yolox_x.msgpack \
  --out checkpoints/yolox_x_qat.msgpack "$@"
