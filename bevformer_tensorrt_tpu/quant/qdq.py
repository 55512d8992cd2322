"""QDQ site module: the flax-native analogue of a TensorQuantizer.

A `QDQ` module marks a quantization site in a model.  Its behaviour is
selected by which variable collections the caller makes available/mutable —
the functional counterpart of pytorch-quantization's
disable-quant/enable-calib mode flags (det2trt/quantization/calibrator_qdq.py:37-60):

  * apply(..., mutable=["amax_stats"])  -> calibration pass 1: running abs-max.
  * apply(..., mutable=["hist_stats"])  -> calibration pass 2: |x| histogram
    binned to the pass-1 amax (requires "amax_stats" in variables).
  * "quant" collection present          -> fake-quant (QDQ) with its scale:
    PTQ-eval / QAT mode.  Gradients use the STE.
  * otherwise                           -> identity (plain FP model).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .fake_quant import fake_quant
from .observers import NUM_BINS, update_amax, update_histogram
from .policy import quant_excluded


class QDQ(nn.Module):
    enabled: bool = True
    with_scale: bool = False  # return (y, scale-or-None) instead of y

    @nn.compact
    def __call__(self, x):
        def ret(y, scale=None):
            return (y, scale) if self.with_scale else y

        if not self.enabled or quant_excluded(self.path):
            return ret(x)
        if self.is_mutable_collection("amax_stats"):
            amax = self.variable("amax_stats", "amax", lambda: jnp.zeros((), jnp.float32))
            if not self.is_initializing():
                amax.value = update_amax(amax.value, x)
            return ret(x)
        if self.is_mutable_collection("hist_stats"):
            hist = self.variable("hist_stats", "hist", lambda: jnp.zeros((NUM_BINS,), jnp.float32))
            amax = self.get_variable("amax_stats", "amax")
            hist.value = update_histogram(hist.value, x, amax)
            return ret(x)
        if self.has_variable("quant", "scale"):
            scale = self.get_variable("quant", "scale")
            return ret(fake_quant(x, scale), scale)
        return ret(x)
