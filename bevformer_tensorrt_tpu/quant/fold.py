"""Fold int8 weight quantization into the checkpoint for deployment.

The int8 layers (models/layers.py QDense/QConv, quant='int8') derive
per-output-channel weight scales from the fp weights at every forward —
fine for PTQ simulation, wasteful for deployment (the reference bakes
quantized weights into the TensorRT engine at build time,
det2trt/convert/onnx2trt.py int8 build).  `fold_int8_weights` walks a
calibrated variable tree and precomputes (wq int8, wscale f32) into the
"quant" collection next to each calibrated layer's activation scale; the
layers then load the folded pair instead of re-deriving, and the fp
kernel never needs to ship.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import traverse_util


def _channel_axis(kernel) -> int:
    # QDense kernel [f_in, f_out] -> 1; QConv kernel HWIO -> 3
    return kernel.ndim - 1


def fold_int8_weights(variables: dict) -> dict:
    """Return `variables` with (wq, wscale) added to the "quant" collection
    for every layer that has a calibrated activation scale (qdq_in/scale).

    Idempotent; layers without calibration scales are left untouched (they
    can't run the real-int8 path anyway — models/layers.py raises).
    """
    params = traverse_util.flatten_dict(variables["params"])
    quant = dict(traverse_util.flatten_dict(variables.get("quant", {})))
    for path, kernel in params.items():
        if path[-1] != "kernel":
            continue
        scope = path[:-1]
        if scope + ("qdq_in", "scale") not in quant:
            continue  # not a calibrated quant site
        axis = _channel_axis(kernel)
        red = tuple(i for i in range(kernel.ndim) if i != axis)
        wscale = jnp.max(jnp.abs(kernel), axis=red) / 127.0 + 1e-12
        shape = [1] * kernel.ndim
        shape[axis] = -1
        wq = jnp.clip(
            jnp.round(kernel / wscale.reshape(shape)), -127, 127
        ).astype(jnp.int8)
        quant[scope + ("wq",)] = wq
        quant[scope + ("wscale",)] = wscale.astype(jnp.float32)
    out = dict(variables)
    out["quant"] = traverse_util.unflatten_dict(quant)
    return out


def attach_quant_scales(variables: dict, quant_tree: dict) -> dict:
    """Attach a loaded scale-dict to `variables`, re-folding the int8
    weights from the CURRENT params.

    A scale checkpoint carries (wq, wscale) folded from the params that
    existed at calibration time; evaluating a different checkpoint (e.g. a
    QAT-finetuned one) with those entries would silently run the stale
    pre-QAT weights.  Strip them and re-fold — idempotent when the params
    are unchanged."""
    flat = {
        p: v
        for p, v in traverse_util.flatten_dict(quant_tree).items()
        if p[-1] not in ("wq", "wscale")
    }
    return fold_int8_weights(
        {**variables, "quant": traverse_util.unflatten_dict(flat)}
    )
