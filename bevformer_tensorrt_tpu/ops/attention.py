"""Fused multi-head attention (the reference's QKVTRT plugin contract).

TPU-native equivalent of TensorRT/plugin/multi_head_attn/
{multiHeadAttnKernel.cu, multiHeadFlashAttnKernel.cu}; python contract at
det2trt/models/functions/multi_head_attn.py:6-54: `softmax(q @ k^T / sqrt(d)) @ v`
over [batch, len, dim] tensors (heads are folded into batch by the caller,
as in the reference's MultiheadAttentionTRT wrapper).

Where the reference picks between a cuBLAS strided-batched-GEMM path (with
engine-build-time algo search) and a WMMA flash kernel, on TPU there is one
right answer: feed the MXU with 128-aligned tiles and let a Pallas
flash-attention kernel (ops/pallas/flash_attn.py) stream KV blocks through
VMEM with online softmax.  This file holds the jnp reference (also the
small-shape path — XLA fuses it fine when kv fits VMEM).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def qkv(query: jax.Array, key: jax.Array, value: jax.Array) -> jax.Array:
    """Fused attention, jnp reference.

    Args:
      query: [B, q_len, dim]   (B typically batch*heads)
      key:   [B, kv_len, dim]
      value: [B, kv_len, dim]
    Returns:
      [B, q_len, dim]
    """
    cdtype = jnp.float32
    d = query.shape[-1]
    q = query.astype(cdtype) * (1.0 / jnp.sqrt(jnp.asarray(d, cdtype)))
    # precision="highest": this is the oracle path; on TPU the default f32
    # matmul would otherwise drop to bf16 passes.
    logits = jnp.einsum(
        "bqd,bkd->bqk", q, key.astype(cdtype),
        preferred_element_type=cdtype, precision="highest",
    )
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bqk,bkd->bqd", probs, value.astype(cdtype),
        preferred_element_type=cdtype, precision="highest",
    )
    return out.astype(query.dtype)


def multi_head_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    num_heads: int,
    impl=qkv,
) -> jax.Array:
    """Split [B, len, embed] into heads, run fused qkv, merge heads.

    Matches det2trt/models/modules/multi_head_attention.py:110-255's
    head-folding convention (heads folded into the batch axis).
    """
    B, q_len, E = query.shape
    kv_len = key.shape[1]
    hd = E // num_heads

    def split(x, L):
        return (
            x.reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3).reshape(B * num_heads, L, hd)
        )

    out = impl(split(query, q_len), split(key, kv_len), split(value, kv_len))
    return out.reshape(B, num_heads, q_len, hd).transpose(0, 2, 1, 3).reshape(B, q_len, E)


# ---- differentiable flash wrappers -----------------------------------------
# The Pallas flash kernels are inference-only primitives (no JVP rule, like
# the reference's QKV plugin vs mmcv's torch attention for training).  These
# custom_vjp wrappers run the kernel forward and the jnp qkv math's VJP
# backward — the two compute the same function, so gradients are consistent.
@jax.custom_vjp
def flash_attention_diff(query, key, value):
    from .pallas.flash_attn import flash_attention

    return flash_attention(query, key, value)


def _flash_diff_fwd(query, key, value):
    return flash_attention_diff(query, key, value), (query, key, value)


def _flash_diff_bwd(res, g):
    query, key, value = res
    _, vjp = jax.vjp(qkv, query, key, value)
    return vjp(g)


flash_attention_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


@jax.custom_vjp
def flash_attention_int8_diff(query, key, value):
    from .pallas.flash_attn import flash_attention_int8

    return flash_attention_int8(query, key, value)


def _flash_i8_diff_fwd(query, key, value):
    return flash_attention_int8_diff(query, key, value), (query, key, value)


def _flash_i8_diff_bwd(res, g):
    # straight-through: gradients of the fp attention math (the QAT STE
    # convention — the int8 rounding inside the kernel is not differentiated)
    query, key, value = res
    _, vjp = jax.vjp(qkv, query, key, value)
    return vjp(g)


flash_attention_int8_diff.defvjp(_flash_i8_diff_fwd, _flash_i8_diff_bwd)
