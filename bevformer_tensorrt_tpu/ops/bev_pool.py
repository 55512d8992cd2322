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


@functools.partial(
    jax.jit, static_argnames=("out_height", "out_width", "impl")
)
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
    impl: str = "scatter",
) -> jax.Array:
    """LSS splat.

    Args:
      depth: [N, D, H, W] per-camera depth distributions.
      feat:  [N, H, W, C] per-camera image features.
      ranks_depth/ranks_feat: [P] int32 flat indices into depth/feat.
      ranks_bev: [P] int32 flat BEV cell index in [0, out_h*out_w); -1 = pad,
        SORTED ascending over the valid prefix (voxel_pooling_prepare).
      interval_starts/lengths: [I] int32 segment boundaries over the sorted
        ranks (pad intervals: length 0).  Required for impl='interval'.
      impl: 'scatter' — P-row scatter-add (any rank order; the XLA scatter
        unit serializes on duplicate cells).  'interval' — cumsum over the
        sorted contributions + boundary differences per interval + ONE
        unique-cell scatter of I<=cells rows: trades the 400k-row
        accumulating scatter for a log-depth scan, the TPU-friendly form
        of the CUDA kernel's one-thread-block-per-interval walk
        (bevPoolKernel.cu:20-150).  f32 cumsum; boundary differences keep
        ~1e-6 relative error on realistic magnitudes (tested).
    Returns:
      [1, out_height, out_width, C] pooled BEV features.
    """
    C = feat.shape[-1]
    # interval's cumsum needs f32 (boundary differences); the scatter paths
    # accumulate in the INPUT dtype so a bf16 deploy halves the scatter and
    # gather bytes (per-cell sums are short — tens of points)
    cdtype = jnp.float32 if impl == "interval" else jnp.promote_types(depth.dtype, feat.dtype)
    d_flat = depth.astype(cdtype).reshape(-1)
    f_flat = feat.astype(cdtype).reshape(-1, C)

    valid = ranks_bev >= 0
    rd = jnp.where(valid, ranks_depth, 0)
    rf = jnp.where(valid, ranks_feat, 0)

    contrib = d_flat[rd][:, None] * f_flat[rf]
    contrib = jnp.where(valid[:, None], contrib, 0.0)
    cells = out_height * out_width

    if impl == "interval":
        assert interval_starts is not None and interval_lengths is not None
        P = ranks_bev.shape[0]
        csum = jnp.cumsum(contrib, axis=0)  # [P, C]
        starts = interval_starts.astype(jnp.int32)
        lens = interval_lengths.astype(jnp.int32)
        live = lens > 0
        ends = jnp.clip(starts + lens - 1, 0, P - 1)
        hi = csum[ends]
        lo = jnp.where(
            (starts > 0)[:, None], csum[jnp.clip(starts - 1, 0, P - 1)], 0.0
        )
        seg = jnp.where(live[:, None], hi - lo, 0.0)  # [I, C]
        cell = jnp.where(
            live, ranks_bev[jnp.clip(starts, 0, P - 1)], cells
        )  # live cells are unique; pads share the dropped bucket
        out = jnp.zeros((cells + 1, C), cdtype)
        out = out.at[cell].add(seg, mode="drop")
        return out[:-1].reshape(1, out_height, out_width, C).astype(feat.dtype)

    rb = jnp.where(valid, ranks_bev, cells)  # pad bucket
    out = jnp.zeros((cells + 1, C), cdtype)
    # ranks_bev is sorted ascending over the valid prefix and pads map to
    # the max bucket, so rb is globally sorted — 'scatter_sorted' passes the
    # hint through to the TPU scatter unit (A/B: tools/bevpool_ab.py)
    out = out.at[rb].add(
        contrib, mode="drop", indices_are_sorted=(impl == "scatter_sorted")
    )
    out = out[:-1].reshape(1, out_height, out_width, C)
    return out.astype(feat.dtype)
