#!/usr/bin/env bash
# INT8 PTQ calibration for CenterNet (reference: post_training_quant.sh,
# configs/centernet/centernet_resnet18_140e_coco_trt_q.py)
set -e
COCO_ROOT=${COCO_ROOT:-data/coco}
python tools/2d/calibrate.py centernet_r18 \
  --ann "$COCO_ROOT/annotations/instances_val2017.json" \
  --img-root "$COCO_ROOT/val2017" --length 512 --method percentile \
  --out checkpoints/centernet_r18_scales.msgpack "$@"
