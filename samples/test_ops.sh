#!/usr/bin/env bash
# Op-library golden tests (reference: samples/test_trt_ops.sh)
#
# Two surfaces, mirroring the reference's split between unit tests and the
# on-engine plugin harness (tools/test_trt_ops.py):
#   1. CPU golden tests (interpret-mode kernels vs torch-contract oracles)
#   2. --device: every Pallas kernel x precision at REAL deploy shapes on
#      the TPU, with adversarial data, each case subprocess-isolated so a
#      kernel fault cannot kill the harness (tools/device_op_check.py)
set -e
if [ "$1" = "--device" ]; then
  shift
  python tools/device_op_check.py "$@"
else
  python -m pytest tests/test_msda.py tests/test_grid_sample.py tests/test_ops_misc.py tests/test_pallas.py -q
fi
