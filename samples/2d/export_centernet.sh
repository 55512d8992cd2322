#!/usr/bin/env bash
# Export the CenterNet engine artifact (reference: centernet export chain)
set -e
python tools/2d/export.py centernet_r18 --dtype bfloat16 --quant int8 \
  --out artifacts/centernet_r18 "$@"
