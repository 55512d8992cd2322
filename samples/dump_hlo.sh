#!/usr/bin/env bash
# Dump the compiled program for inspection (reference: onnx_visualization.sh —
# there the artifact is an ONNX graph; here it is StableHLO / optimized HLO,
# the graph XLA actually compiles).
set -e
MODEL=${1:-tiny}; shift || true
python tools/dump_hlo.py "$MODEL" --stage stablehlo --out "hlo_${MODEL}.stablehlo.txt" "$@"
python tools/dump_hlo.py "$MODEL" --stage optimized --out "hlo_${MODEL}.optimized.txt" "$@"
