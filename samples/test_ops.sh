#!/usr/bin/env bash
# Op-library golden tests (reference: samples/test_trt_ops.sh)
set -e
python -m pytest tests/test_msda.py tests/test_grid_sample.py tests/test_ops_misc.py tests/test_pallas.py -q
