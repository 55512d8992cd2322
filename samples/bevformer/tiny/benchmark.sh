#!/usr/bin/env bash
set -e
python bench.py --model tiny --dtype bfloat16 "$@"
