"""Quantization subsystem: observers, QDQ fake-quant, calibration driver.

Replaces the reference's two stacks (TRT engine calibrators + NVIDIA
pytorch-quantization QDQ, SURVEY.md §2.3 P3/P4) with one functional design:
calibration produces a scale-dict; the deployment artifact is
params + scale-dict + the AOT-compiled executable.
"""
from .observers import (
    NUM_BINS,
    CalibrationResult,
    compute_scale,
    entropy_threshold,
    update_amax,
    update_histogram,
)
from .fake_quant import dequantize, fake_quant, per_channel_scale, quantize
from .qdq import QDQ
from .calibrate import calibrate

__all__ = [
    "NUM_BINS",
    "CalibrationResult",
    "compute_scale",
    "entropy_threshold",
    "update_amax",
    "update_histogram",
    "dequantize",
    "fake_quant",
    "per_channel_scale",
    "quantize",
    "QDQ",
    "calibrate",
]
