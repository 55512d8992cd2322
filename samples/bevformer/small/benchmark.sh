#!/usr/bin/env bash
set -e
python bench.py --model small --dtype bfloat16 "$@"
