"""Multi-scale deformable attention — the framework's hot op.

TPU-native equivalent of the reference's fused MultiScaleDeformableAttnTRT
plugin (TensorRT/plugin/multi_scale_deformable_attn/multiScaleDeformableAttnKernel.cu):
one op takes *raw* (pre-softmax) attention logits, computes the softmax over
(levels x points), builds sampling locations from
`reference_points + offsets / (w, h)`, bilinearly gathers from every level,
and produces the weighted sum.  Keeping softmax inside the op mirrors the
plugin's fusion contract (…Kernel.cu:643-687) so calibration scales attach to
the same tensors as the reference.

Two implementations share this contract:
  * `multi_scale_deformable_attn` (this file): pure-jnp, vectorized gathers
    via `jnp.take_along_axis`, static level loop.  Differentiable — also the
    training path.  Serves as the oracle for the Pallas kernel
    (`ops/pallas/msda.py`), mirroring the reference's P5-as-oracle tests.
  * Pallas kernel: per-(head, query-block) grid; value level resident in
    VMEM; used on TPU when shapes qualify.

Layout note (TPU-first): value is [bs, num_keys, heads, ch] with ch minor —
gathers pull contiguous (heads*ch) rows, which XLA vectorizes over lanes.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def msda_sampling_locations(
    reference_points: jax.Array,
    sampling_offsets: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    num_heads: int,
) -> jax.Array:
    """Compute normalized sampling locations.

    Mirrors det2trt/models/functions/multi_scale_deformable_attn.py:62-82.

    Args:
      reference_points: [bs, num_q, 1, ppg*2] normalized [0,1] (x, y),
        ppg = points-per-group (num_Z_anchors for spatial cross attn, 1 else).
      sampling_offsets: [bs, num_q, heads, L*P*2] raw offsets in *pixels* of
        each level (divided by that level's (w, h) here).
      spatial_shapes: static [(h, w)] * L.
    Returns:
      [bs, num_q, heads, L, P, 2] normalized locations.
    """
    bs, num_q = reference_points.shape[:2]
    L = len(spatial_shapes)
    ppg = reference_points.shape[-1] // 2
    off = sampling_offsets.reshape(bs, num_q, num_heads, L, -1, ppg, 2)
    ref = reference_points.reshape(bs, num_q, 1, 1, 1, ppg, 2)
    norm = jnp.asarray(
        [[w, h] for (h, w) in spatial_shapes], dtype=off.dtype
    ).reshape(1, 1, 1, L, 1, 1, 2)
    loc = ref + off / norm
    return loc.reshape(bs, num_q, num_heads, L, -1, 2)


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def multi_scale_deformable_attn(
    value: jax.Array,
    reference_points: jax.Array,
    sampling_offsets: jax.Array,
    attention_weights: jax.Array,
    spatial_shapes: Tuple[Tuple[int, int], ...],
) -> jax.Array:
    """Fused multi-scale deformable attention (jnp reference / XLA path).

    Args:
      value: [bs, num_keys, heads, ch] — levels concatenated along num_keys
        in `spatial_shapes` order (row-major h*w each).
      reference_points: [bs, num_q, 1, ppg*2] normalized [0,1].
      sampling_offsets: [bs, num_q, heads, L*P*2] raw pixel offsets.
      attention_weights: [bs, num_q, heads, L*P] RAW logits (softmax inside).
      spatial_shapes: static tuple of (h, w) per level.

    Returns:
      [bs, num_q, heads*ch]
    """
    bs, num_keys, num_heads, ch = value.shape
    num_q = reference_points.shape[1]
    L = len(spatial_shapes)
    P = attention_weights.shape[-1] // L
    assert num_keys == sum(h * w for h, w in spatial_shapes)

    cdtype = jnp.float32
    weights = jax.nn.softmax(attention_weights.astype(cdtype), axis=-1)
    weights = weights.reshape(bs, num_q, num_heads, L, P)

    loc = msda_sampling_locations(
        reference_points.astype(cdtype),
        sampling_offsets.astype(cdtype),
        spatial_shapes,
        num_heads,
    )  # [bs, q, h, L, P, 2]

    out = jnp.zeros((bs, num_q, num_heads, ch), cdtype)
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W].astype(cdtype)  # [bs, HW, heads, ch]
        start += H * W
        # Normalized [0,1] -> pixel coords, align_corners=False convention:
        # grid_sample(2*loc-1) with align_corners=False == loc*size - 0.5.
        x = loc[..., lvl, :, 0] * W - 0.5  # [bs, q, heads, P]
        y = loc[..., lvl, :, 1] * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)

        def corner(ix, iy, w):
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
            # gather per (bs, head): [bs, HW, heads, ch] indexed at axis 1
            # with [bs, q, heads, P] -> [bs, q*P, heads] per-head indices.
            idxh = idx.transpose(0, 1, 3, 2).reshape(bs, num_q * P, num_heads)
            g = jnp.take_along_axis(v, idxh[..., None], axis=1)
            g = g.reshape(bs, num_q, P, num_heads, ch).transpose(0, 1, 3, 2, 4)
            m = (w * valid).astype(cdtype)  # [bs, q, heads, P]
            return g, m

        g00, m00 = corner(ix0, iy0, (1 - wx1) * (1 - wy1))
        g01, m01 = corner(ix0 + 1, iy0, wx1 * (1 - wy1))
        g10, m10 = corner(ix0, iy0 + 1, (1 - wx1) * wy1)
        g11, m11 = corner(ix0 + 1, iy0 + 1, wx1 * wy1)

        wl = weights[:, :, :, lvl]  # [bs, q, heads, P]
        taps = g00 * m00[..., None] + g01 * m01[..., None] + g10 * m10[..., None] + g11 * m11[..., None]
        out = out + jnp.einsum("bqhpc,bqhp->bqhc", taps, wl, precision="highest")

    return out.reshape(bs, num_q, num_heads * ch).astype(value.dtype)
