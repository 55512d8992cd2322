"""INT8 matmul Pallas kernel: int8 x int8 -> int32 accumulate -> rescale.

TPU-native equivalent of the reference plugins' INT8 paths (dp4a
micro-batches in multiScaleDeformableAttnKernel.cu:849-956 and the int8
cuBLAS GEMMs of the DCN/QKV plugins): activations and weights arrive
already quantized with per-tensor (activation) and per-channel (weight)
scales, the MXU multiplies int8 natively accumulating int32, and the
epilogue fuses dequantization — one kernel, no fp roundtrip through HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _int8_mm_kernel(x_ref, w_ref, sx_ref, sw_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _finalize():
        scale = sx_ref[0, 0] * sw_ref[0, :]  # per-output-channel
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * scale[None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret"))
def int8_matmul(
    x: jax.Array,        # [M, K] int8
    w: jax.Array,        # [K, N] int8
    x_scale: jax.Array,  # [] per-tensor activation scale
    w_scale: jax.Array,  # [N] per-channel weight scales
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Dequantized product x_scale * w_scale[n] * (x @ w) in out_dtype."""
    M, K = x.shape
    N = w.shape[1]
    pm, pn, pk = (-M) % block_m, (-N) % block_n, (-K) % block_k
    if pm or pk:
        x = jnp.pad(x, ((0, pm), (0, pk)))
    if pk or pn:
        w = jnp.pad(w, ((0, pk), (0, pn)))
    if pn:
        w_scale = jnp.pad(w_scale, (0, pn))
    Mp, Np, Kp = M + pm, N + pn, K + pk

    out = pl.pallas_call(
        _int8_mm_kernel,
        grid=(Mp // block_m, Np // block_n, Kp // block_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        interpret=interpret,
    )(x, w, x_scale.reshape(1, 1), w_scale.reshape(1, -1))
    return out[:M, :N]


def int8_matmul_reference(x, w, x_scale, w_scale):
    """jnp oracle: int32-exact accumulate then dequant."""
    acc = jnp.dot(x.astype(jnp.int32), w.astype(jnp.int32))
    return acc.astype(jnp.float32) * x_scale * w_scale[None, :]
