"""BEV Pool v2 — BEVDet's LSS splat as a segment-sum.

TPU-native equivalent of the reference's BEVPoolV2TRT plugin
(TensorRT/plugin/bev_pool_v2/bevPoolKernel.cu:20-150, python contract at
det2trt/models/functions/bev_pool_v2.py).  For every precomputed BEV-cell
interval it sums `depth[ranks_depth[i]] * feat[ranks_feat[i]]` into
`out[ranks_bev[i]]`.

TPU-first design: the CUDA kernel walks intervals with one thread block per
(interval, channel-chunk).  On TPU we express the same computation as a
gather + `segment_sum`-style scatter-add, which XLA lowers to the native
scatter unit; `interval_starts/lengths` are accepted for API parity but the
scatter-add form doesn't need them (ranks_bev already encodes the segment of
every point).  Invalid points are padded with rank == -1 (the reference pads
ranks to a static size the same way for TRT; tools/bevdet/pth2onnx.py:60-97).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_height", "out_width"))
def bev_pool_v2(
    depth: jax.Array,
    feat: jax.Array,
    ranks_depth: jax.Array,
    ranks_feat: jax.Array,
    ranks_bev: jax.Array,
    interval_starts: jax.Array = None,
    interval_lengths: jax.Array = None,
    out_height: int = 128,
    out_width: int = 128,
) -> jax.Array:
    """LSS splat.

    Args:
      depth: [N, D, H, W] per-camera depth distributions.
      feat:  [N, H, W, C] per-camera image features.
      ranks_depth/ranks_feat: [P] int32 flat indices into depth/feat.
      ranks_bev: [P] int32 flat BEV cell index in [0, out_h*out_w); -1 = pad.
      interval_starts/lengths: accepted for parity; unused by the
        scatter-add formulation (see module docstring).
    Returns:
      [1, out_height, out_width, C] pooled BEV features.
    """
    del interval_starts, interval_lengths
    C = feat.shape[-1]
    cdtype = jnp.float32
    d_flat = depth.astype(cdtype).reshape(-1)
    f_flat = feat.astype(cdtype).reshape(-1, C)

    valid = ranks_bev >= 0
    rd = jnp.where(valid, ranks_depth, 0)
    rf = jnp.where(valid, ranks_feat, 0)
    rb = jnp.where(valid, ranks_bev, out_height * out_width)  # pad bucket

    contrib = d_flat[rd][:, None] * f_flat[rf]
    contrib = jnp.where(valid[:, None], contrib, 0.0)

    out = jnp.zeros((out_height * out_width + 1, C), cdtype)
    out = out.at[rb].add(contrib, mode="drop")
    out = out[:-1].reshape(1, out_height, out_width, C)
    return out.astype(feat.dtype)
