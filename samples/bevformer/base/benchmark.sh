#!/usr/bin/env bash
set -e
python bench.py --model base --dtype bfloat16 "$@"
