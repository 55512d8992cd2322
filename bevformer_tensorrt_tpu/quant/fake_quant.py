"""Fake quantization (QDQ) primitives with straight-through gradients.

Equivalent of pytorch-quantization's TensorQuantizer as used by the
reference's QAT modules (det2trt/models/backbones/resnet.py ResNetQ etc.):
`fake_quant` inserts quantize->dequantize in the graph; its custom VJP is the
straight-through estimator (pass gradient inside the clip range, zero
outside), which is what makes 1-epoch QAT fine-tuning work (SURVEY.md §3.5).

`quantize`/`dequantize` are the real int8 conversions used by the deployed
inference path and the Pallas int8 kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize(x: jax.Array, scale: jax.Array) -> jax.Array:
    """f32/bf16 -> int8 with per-tensor (or broadcastable) scale."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -128, 127).astype(jnp.int8)


def dequantize(q: jax.Array, scale: jax.Array, dtype=jnp.float32) -> jax.Array:
    return (q.astype(jnp.float32) * scale).astype(dtype)


@jax.custom_vjp
def fake_quant(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Quantize-dequantize with STE backward."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127)
    return (q * scale).astype(x.dtype)


def _fq_fwd(x, scale):
    return fake_quant(x, scale), (x, scale)


def _fq_bwd(res, g):
    x, scale = res
    # STE: pass-through inside the representable range, zero outside.
    lim = 127.0 * scale
    mask = (jnp.abs(x.astype(jnp.float32)) <= lim).astype(g.dtype)
    return g * mask, jnp.zeros_like(scale)


fake_quant.defvjp(_fq_fwd, _fq_bwd)


def per_channel_scale(w: jax.Array, axis: int = 0) -> jax.Array:
    """Per-output-channel weight scale (reference: init_quant_desc per-channel
    option, det2trt/quantization/calibrator_qdq.py:8-28)."""
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes, keepdims=True)
    return jnp.maximum(amax, 1e-12) / 127.0
