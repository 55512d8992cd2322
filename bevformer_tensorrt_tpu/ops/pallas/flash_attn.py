"""Flash attention Pallas kernel (blockwise online-softmax).

TPU-native equivalent of the reference's WMMA flash-MHA plugin
(TensorRT/plugin/multi_head_attn/multiHeadFlashAttnKernel.cu:13-52 — 16x16
tensor-core tiles with shared-memory staging, selected when
q_len%64==0 && kv_len%64==0 && head_dim in {32,64}).  Here the MXU replaces
WMMA and VMEM replaces shared memory: the grid walks (batch, q-block,
kv-block) with the kv axis innermost (sequential on TPU), carrying the
running max / denominator / accumulator in VMEM scratch across kv steps —
the standard online-softmax recurrence the CUDA kernel hand-schedules.

Odd lengths are zero-padded by the wrapper and masked with -inf logits, so
any (q_len, kv_len) works — the TPU analogue of the plugin's eligibility
fallback (multiHeadAttnPlugin.h:86-91).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, kv_len, block_k):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)  # [Bq, d]
    k = k_ref[0].astype(jnp.float32)  # [Bk, d]
    v = v_ref[0].astype(jnp.float32)  # [Bk, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Bq, Bk]

    # mask out zero-padded kv rows
    kv_idx = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kv_idx < kv_len, s, NEG_INF)

    m_prev = m_ref[:]                        # [Bq, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                   # [Bq, Bk]
    alpha = jnp.exp(m_prev - m_new)          # [Bq, 1]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == nj - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _flash_kernel_int8(
    scales_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, kv_len, block_k,
):
    """int8 flash attention step: both matmuls run int8 on the MXU.

    The reference's int8 flash-MHA plugin contract
    (TensorRT/plugin/multi_head_attn/multiHeadFlashAttnKernel.cu int8 path,
    x8.2 vs its fp32): q/k/v arrive int8 with per-tensor scales folded into
    `scale_qk` (= sq*sk/sqrt(d)); probabilities are requantized to int8
    with the static 127 scale (softmax output is in (0, 1]); `scale_pv`
    (= sv/127) dequantizes the p@v accumulation."""
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    scale_qk = scales_ref[0]  # sq*sk/sqrt(d)
    scale_pv = scales_ref[1]  # sv/127

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [Bq, d] int8
    k = k_ref[0]  # [Bk, d] int8
    v = v_ref[0]  # [Bk, d] int8

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * scale_qk  # [Bq, Bk]

    kv_idx = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kv_idx < kv_len, s, NEG_INF)

    m_prev = m_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new
    p8 = jnp.round(p * 127.0).astype(jnp.int8)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p8, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * scale_pv

    @pl.when(j == nj - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention_int8(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """int8 flash attention: dynamic per-tensor amax quantization of q/k/v,
    int8 MXU for both matmuls, f32 online softmax.  Same signature/contract
    as `flash_attention`; ~0.5% output error on unit-scale inputs."""
    interpret = interpret or jax.default_backend() != "tpu"

    B, q_len, d = query.shape
    kv_len = key.shape[1]

    def q8(x):
        s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-12) / 127.0
        xi = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
        return xi.astype(jnp.int8), s

    qi, sq = q8(query)
    ki, sk = q8(key)
    vi, sv = q8(value)
    scale_qk = sq * sk / float(d) ** 0.5
    scale_pv = sv / 127.0

    q_pad = (-q_len) % block_q
    k_pad = (-kv_len) % block_k
    if q_pad:
        qi = jnp.pad(qi, ((0, 0), (0, q_pad), (0, 0)))
    if k_pad:
        ki = jnp.pad(ki, ((0, 0), (0, k_pad), (0, 0)))
        vi = jnp.pad(vi, ((0, 0), (0, k_pad), (0, 0)))
    Lq, Lk = q_len + q_pad, kv_len + k_pad

    scales = jnp.stack([scale_qk, scale_pv]).astype(jnp.float32)

    grid = (B, Lq // block_q, Lk // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel_int8, kv_len=kv_len, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Lq, d), query.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(scales, qi, ki, vi)
    return out[:, :q_len]


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q k^T / sqrt(d)) v, blockwise.

    Args:
      query: [B, q_len, d]; key/value: [B, kv_len, d] (B = batch*heads).
    Returns: [B, q_len, d] in query.dtype.
    """
    interpret = interpret or jax.default_backend() != "tpu"

    B, q_len, d = query.shape
    kv_len = key.shape[1]
    scale = 1.0 / float(d) ** 0.5

    q_pad = (-q_len) % block_q
    k_pad = (-kv_len) % block_k
    if q_pad:
        query = jnp.pad(query, ((0, 0), (0, q_pad), (0, 0)))
    if k_pad:
        key = jnp.pad(key, ((0, 0), (0, k_pad), (0, 0)))
        value = jnp.pad(value, ((0, 0), (0, k_pad), (0, 0)))
    Lq, Lk = q_len + q_pad, kv_len + k_pad

    grid = (B, Lq // block_q, Lk // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=kv_len, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Lq, d), query.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((block_q, 1), jnp.float32),  # running denom
            pltpu.VMEM((block_q, d), jnp.float32),  # accumulator
        ],
        interpret=interpret,
    )(query, key, value)
    return out[:, :q_len]
