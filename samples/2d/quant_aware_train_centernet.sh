#!/usr/bin/env bash
# CenterNet QAT fine-tune at calibrated scales (reference: the 1-epoch
# tiny-lr QAT recipe of configs/centernet/centernet_..._trt_q.py)
set -e
COCO_ROOT=${COCO_ROOT:-data/coco}
python tools/2d/train.py centernet_r18 \
  --ann "$COCO_ROOT/annotations/instances_train2017.json" \
  --img-root "$COCO_ROOT/train2017" --batch 16 --steps 2000 \
  --checkpoint checkpoints/centernet_r18.msgpack \
  --quant-scales checkpoints/centernet_r18_scales.msgpack \
  --out checkpoints/centernet_r18_qat.msgpack "$@"
