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
