"""Batched matrix inverse.

TPU-native equivalent of the reference's InverseTRT plugin
(TensorRT/plugin/inverse/inverseKernel.cu:33-39 — cuBLAS getrf/getriBatched,
FP32 only), python contract det2trt/models/functions/inverse.py.  The
reference uses it for batched 4x4 lidar2img inverses; on TPU a closed-form
cofactor inverse for 4x4 keeps everything on the VPU with no pivoting, and
`jnp.linalg.inv` covers the general [B, C, H, W] -> N matrices case.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def inverse(x: jax.Array) -> jax.Array:
    """Invert a batch of square matrices; input [..., M, M]."""
    return jnp.linalg.inv(x.astype(jnp.float32)).astype(x.dtype)


@jax.jit
def inverse_4x4(x: jax.Array) -> jax.Array:
    """Closed-form cofactor inverse of [..., 4, 4] matrices (VPU-only)."""
    x = x.astype(jnp.float32)
    m = [[x[..., i, j] for j in range(4)] for i in range(4)]

    def det3(r, c):
        rs = [i for i in range(4) if i != r]
        cs = [j for j in range(4) if j != c]
        a, b, cc = rs
        d, e, f = cs
        return (
            m[a][d] * (m[b][e] * m[cc][f] - m[b][f] * m[cc][e])
            - m[a][e] * (m[b][d] * m[cc][f] - m[b][f] * m[cc][d])
            + m[a][f] * (m[b][d] * m[cc][e] - m[b][e] * m[cc][d])
        )

    cof = [[((-1.0) ** (i + j)) * det3(i, j) for j in range(4)] for i in range(4)]
    det = sum(m[0][j] * cof[0][j] for j in range(4))
    adj = jnp.stack([jnp.stack([cof[j][i] for j in range(4)], -1) for i in range(4)], -2)
    return adj / det[..., None, None]
