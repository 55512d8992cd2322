"""Post-training calibration driver.

Functional replacement for the reference's calibration loops
(det2trt/quantization/calibrator_trt.py get_batch feeding TRT's entropy
calibrator, and calibrator_qdq.py's collect-then-load_calib_amax):

  1. pass 1 over calibration batches with mutable=["amax_stats"],
  2. pass 2 with mutable=["hist_stats"] (histograms binned to pass-1 amax),
  3. offline scale selection per site (max / percentile / entropy),
  4. emit the "quant" variable collection + a flat CalibrationResult.

The stats passes are method-independent (amax + |x| histograms), so
`collect_stats` runs once and `scales_from_stats` derives any number of
method variants offline — the calibration tools use this to emit
max/percentile/entropy artifacts from a single device pass.

The driver is model-agnostic: it takes flax `module.apply`-style callables.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util
from flax.core import freeze, unfreeze

from .observers import CalibrationResult, compute_scale


def collect_stats(
    apply_fn: Callable, variables: dict, batches: Iterable, with_hist: bool = True
) -> Tuple[dict, dict]:
    """Run the two stats passes; returns (amax_stats, hist_stats)."""
    variables = unfreeze(variables)
    batches = list(batches)

    amax_stats: dict = {}
    for batch in batches:
        v = dict(variables)
        if amax_stats:
            v["amax_stats"] = amax_stats
        mutated = apply_fn(v, batch, ["amax_stats"])
        amax_stats = unfreeze(mutated)["amax_stats"]

    hist_stats: dict = {}
    if with_hist:
        for batch in batches:
            v = dict(variables)
            v["amax_stats"] = amax_stats
            if hist_stats:
                v["hist_stats"] = hist_stats
            mutated = apply_fn(v, batch, ["hist_stats"])
            hist_stats = unfreeze(mutated)["hist_stats"]
    return amax_stats, hist_stats


def scales_from_stats(
    amax_stats: dict,
    hist_stats: dict,
    method: str = "entropy",
    percentile: float = 99.99,
) -> Tuple[dict, CalibrationResult]:
    """Offline scale selection from collected stats (numpy; no device)."""
    flat_amax = traverse_util.flatten_dict(amax_stats)
    flat_hist = traverse_util.flatten_dict(hist_stats) if hist_stats else {}

    flat_scales = {}
    named_scales = {}
    for path, amax in flat_amax.items():
        assert path[-1] == "amax"
        hist = flat_hist.get(path[:-1] + ("hist",))
        hist_np = np.asarray(hist) if hist is not None else None
        scale = compute_scale(float(amax), hist_np, method=method, percentile=percentile)
        flat_scales[path[:-1] + ("scale",)] = jnp.asarray(scale, jnp.float32)
        named_scales["/".join(path[:-1])] = scale

    quant_vars = {"quant": traverse_util.unflatten_dict(flat_scales)}
    return quant_vars, CalibrationResult(scales=named_scales, method=method)


def calibrate(
    apply_fn: Callable,
    variables: dict,
    batches: Iterable,
    method: str = "entropy",
    percentile: float = 99.99,
) -> Tuple[dict, CalibrationResult]:
    """Run two-pass calibration and return (quant_collection, result).

    Args:
      apply_fn: fn(variables, batch, mutable) -> mutated-collections dict.
        Typically `lambda v, b, m: module.apply(v, **b, mutable=m)[1]`.
      variables: model variables (params etc.).
      batches: iterable of calibration batches (re-iterable if method needs
        two passes; a list is safest).
      method: 'max' | 'percentile' | 'entropy'.

    Returns:
      quant_vars: {"quant": ...} collection to merge into apply variables.
      result: flat site-name -> scale CalibrationResult.
    """
    amax_stats, hist_stats = collect_stats(
        apply_fn, variables, batches, with_hist=method != "max"
    )
    return scales_from_stats(amax_stats, hist_stats, method=method, percentile=percentile)
