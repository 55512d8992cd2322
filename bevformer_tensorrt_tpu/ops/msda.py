"""Multi-scale deformable attention — the framework's hot op.

TPU-native equivalent of the reference's fused MultiScaleDeformableAttnTRT
plugin (TensorRT/plugin/multi_scale_deformable_attn/multiScaleDeformableAttnKernel.cu):
one op takes *raw* (pre-softmax) attention logits, computes the softmax over
(levels x points), builds sampling locations from
`reference_points + offsets / (w, h)`, bilinearly gathers from every level,
and produces the weighted sum.  Keeping softmax inside the op mirrors the
plugin's fusion contract (…Kernel.cu:643-687) so calibration scales attach to
the same tensors as the reference.

Memory-bounded TPU design (the CUDA kernel's streaming behavior, re-expressed
for XLA): the four bilinear corners of all P points are gathered as ONE
take_along_axis of 4P rows per (query, head) — one gather buffer instead of
four — and the query axis is processed in fixed-size chunks via `lax.map`,
which serializes chunks so peak HBM is one chunk's gather buffer
(bs x chunk x heads x 4P x ch) rather than the full 40k-query tensor that
OOMs a 16 GB chip.  Gathers and the weighted-sum einsum run in the value
dtype (bf16 on TPU) with fp32 accumulation; softmax is fp32.

`multi_scale_deformable_attn_reference` is the unchunked fp32 oracle used by
golden tests (the reference's P5-as-oracle pattern, SURVEY.md §4).
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


def _corner_pack(v, H, W):
    """[bs, HW, heads, ch] -> [bs, HW, heads, 4*ch] with the 4 bilinear
    corner rows (k, k+1, k+W, k+W+1) packed per key.

    One gather index then fetches all 4 corners (the gather is index-rate
    bound on TPU — ~60 M rows/s regardless of row size — so 4x fewer
    indices ~= 4x faster).  Wrap-around rows from the rolls are always
    masked by the out-of-bounds corner weights."""
    v01 = jnp.roll(v, -1, axis=1)
    v10 = jnp.roll(v, -W, axis=1)
    v11 = jnp.roll(v, -(W + 1), axis=1)
    return jnp.concatenate([v, v01, v10, v11], axis=-1)


def _msda_chunk(value_levels, weights, loc, spatial_shapes, out_dtype):
    """One query chunk. value_levels: list of corner-packed
    [bs, HW, heads, 4*ch] (op dtype); weights [bs, q, heads, L, P] fp32;
    loc [bs, q, heads, L, P, 2] fp32."""
    bs, num_q, num_heads = loc.shape[:3]
    P = loc.shape[4]
    ch = value_levels[0].shape[-1] // 4
    acc = jnp.zeros((bs, num_q, num_heads, ch), jnp.float32)
    for lvl, (H, W) in enumerate(spatial_shapes):
        v4 = value_levels[lvl]
        # normalized [0,1] -> pixel coords (align_corners=False: loc*size-0.5)
        x = loc[..., lvl, :, 0] * W - 0.5  # [bs, q, heads, P]
        y = loc[..., lvl, :, 1] * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)

        # clamp the 2x2 window base into the image; d in {-1, 0, 1} is the
        # shift the clamp introduced.  True-corner weights are remapped to
        # window slots: a corner falling outside the clamped window is
        # always out-of-image (weight 0), so the remap is exact.
        bx = jnp.clip(ix0, 0, max(W - 2, 0))
        by = jnp.clip(iy0, 0, max(H - 2, 0))
        dx = ix0 - bx
        dy = iy0 - by

        ax0 = (1 - wx1) * ((ix0 >= 0) & (ix0 < W))
        ax1 = wx1 * ((ix0 + 1 >= 0) & (ix0 + 1 < W))
        ay0 = (1 - wy1) * ((iy0 >= 0) & (iy0 < H))
        ay1 = wy1 * ((iy0 + 1 >= 0) & (iy0 + 1 < H))

        def slot(d, a0, a1):
            s0 = jnp.where(d == 0, a0, jnp.where(d == -1, a1, 0.0))
            s1 = jnp.where(d == 0, a1, jnp.where(d == 1, a0, 0.0))
            return s0, s1

        sx0, sx1 = slot(dx, ax0, ax1)
        sy0, sy1 = slot(dy, ay0, ay1)

        idx = by * W + bx
        wl = weights[:, :, :, lvl]  # [bs, q, heads, P] fp32
        m4 = jnp.stack(
            [sx0 * sy0 * wl, sx1 * sy0 * wl, sx0 * sy1 * wl, sx1 * sy1 * wl],
            axis=-1,
        )  # [bs, q, heads, P, 4] — slots (k, k+1, k+W, k+W+1)

        # ONE gather of P packed rows per (query, head): [bs, q*P, heads]
        idxh = idx.transpose(0, 1, 3, 2).reshape(bs, num_q * P, num_heads)
        g = jnp.take_along_axis(v4, idxh[..., None], axis=1)
        g = g.reshape(bs, num_q, P, num_heads, 4, ch)  # [b, q, p, h, x, c]
        acc = acc + jnp.einsum(
            "bqphxc,bqhpx->bqhc",
            g,
            m4.astype(g.dtype),
            preferred_element_type=jnp.float32,
        )
    return acc.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("spatial_shapes", "q_chunk"))
def multi_scale_deformable_attn(
    value: jax.Array,
    reference_points: jax.Array,
    sampling_offsets: jax.Array,
    attention_weights: jax.Array,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    q_chunk: int = 2048,
) -> jax.Array:
    """Fused multi-scale deformable attention (chunked XLA path).

    Args:
      value: [bs, num_keys, heads, ch] — levels concatenated along num_keys
        in `spatial_shapes` order (row-major h*w each).
      reference_points: [bs, num_q, 1, ppg*2] normalized [0,1].
      sampling_offsets: [bs, num_q, heads, L*P*2] raw pixel offsets.
      attention_weights: [bs, num_q, heads, L*P] RAW logits (softmax inside).
      spatial_shapes: static tuple of (h, w) per level.
      q_chunk: query-axis chunk size bounding peak memory.

    Returns:
      [bs, num_q, heads*ch] in value.dtype.
    """
    bs, num_keys, num_heads, ch = value.shape
    num_q = reference_points.shape[1]
    L = len(spatial_shapes)
    P = attention_weights.shape[-1] // L
    assert num_keys == sum(h * w for h, w in spatial_shapes)

    weights = jax.nn.softmax(attention_weights.astype(jnp.float32), axis=-1)
    weights = weights.reshape(bs, num_q, num_heads, L, P)
    loc = msda_sampling_locations(
        reference_points.astype(jnp.float32),
        sampling_offsets.astype(jnp.float32),
        spatial_shapes,
        num_heads,
    )  # [bs, q, heads, L, P, 2]

    starts = [0]
    for h, w in spatial_shapes:
        starts.append(starts[-1] + h * w)
    value_levels = [
        _corner_pack(value[:, starts[i] : starts[i + 1]], *spatial_shapes[i])
        for i in range(L)
    ]  # list of [bs, HW, heads, 4*ch]

    if num_q <= q_chunk:
        out = _msda_chunk(value_levels, weights, loc, spatial_shapes, value.dtype)
        return out.reshape(bs, num_q, num_heads * ch)

    pad = (-num_q) % q_chunk
    if pad:
        weights = jnp.pad(weights, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        loc = jnp.pad(loc, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0)))
    n_chunks = (num_q + pad) // q_chunk
    w_chunks = weights.reshape(bs, n_chunks, q_chunk, num_heads, L, P).transpose(
        1, 0, 2, 3, 4, 5
    )
    l_chunks = loc.reshape(bs, n_chunks, q_chunk, num_heads, L, P, 2).transpose(
        1, 0, 2, 3, 4, 5, 6
    )
    out = jax.lax.map(
        lambda wl: _msda_chunk(value_levels, wl[0], wl[1], spatial_shapes, value.dtype),
        (w_chunks, l_chunks),
    )  # [n_chunks, bs, q_chunk, heads, ch]
    out = out.transpose(1, 0, 2, 3, 4).reshape(bs, num_q + pad, num_heads * ch)
    return out[:, :num_q]


def multi_scale_deformable_attn_reference(
    value: jax.Array,
    reference_points: jax.Array,
    sampling_offsets: jax.Array,
    attention_weights: jax.Array,
    spatial_shapes: Tuple[Tuple[int, int], ...],
) -> jax.Array:
    """Unchunked fp32 oracle (golden-test reference; original formulation
    with per-corner gathers — mirrors mmcv's multi_scale_deform_attn math)."""
    bs, num_keys, num_heads, ch = value.shape
    num_q = reference_points.shape[1]
    L = len(spatial_shapes)
    P = attention_weights.shape[-1] // L

    cdtype = jnp.float32
    weights = jax.nn.softmax(attention_weights.astype(cdtype), axis=-1)
    weights = weights.reshape(bs, num_q, num_heads, L, P)
    loc = msda_sampling_locations(
        reference_points.astype(cdtype),
        sampling_offsets.astype(cdtype),
        spatial_shapes,
        num_heads,
    )

    out = jnp.zeros((bs, num_q, num_heads, ch), cdtype)
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W].astype(cdtype)
        start += H * W
        x = loc[..., lvl, :, 0] * W - 0.5
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
            idxh = idx.transpose(0, 1, 3, 2).reshape(bs, num_q * P, num_heads)
            g = jnp.take_along_axis(v, idxh[..., None], axis=1)
            g = g.reshape(bs, num_q, P, num_heads, ch).transpose(0, 1, 3, 2, 4)
            return g, (w * valid).astype(cdtype)

        g00, m00 = corner(ix0, iy0, (1 - wx1) * (1 - wy1))
        g01, m01 = corner(ix0 + 1, iy0, wx1 * (1 - wy1))
        g10, m10 = corner(ix0, iy0 + 1, (1 - wx1) * wy1)
        g11, m11 = corner(ix0 + 1, iy0 + 1, wx1 * wy1)

        wl = weights[:, :, :, lvl]
        taps = (
            g00 * m00[..., None]
            + g01 * m01[..., None]
            + g10 * m10[..., None]
            + g11 * m11[..., None]
        )
        out = out + jnp.einsum("bqhpc,bqhp->bqhc", taps, wl, precision="highest")

    return out.reshape(bs, num_q, num_heads * ch).astype(value.dtype)


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def multi_scale_deformable_attn_lane(
    value: jax.Array,
    reference_points: jax.Array,
    sampling_offsets: jax.Array,
    attention_weights: jax.Array,
    spatial_shapes: Tuple[Tuple[int, int], ...],
) -> jax.Array:
    """MSDA with the Pallas lane-binned gather (ops/pallas/lane_gather).

    Same contract as `multi_scale_deformable_attn`.  The corner-packed
    value tables are transposed to [bs*heads, 4*ch, HW_padded] (keys on
    lanes) and the bilinear taps resolve through in-VMEM vreg lane-gathers
    — measured 4-8x the XLA gather rate on v5e without binning (spatially
    coherent BEV-query taps), 25x+ with span-1 binning (round-2 work).
    TPU-only (Mosaic); use the default op elsewhere.
    """
    from .pallas.lane_gather import lane_gather

    bs, num_keys, num_heads, ch = value.shape
    num_q = reference_points.shape[1]
    L = len(spatial_shapes)
    P = attention_weights.shape[-1] // L

    weights = jax.nn.softmax(attention_weights.astype(jnp.float32), axis=-1)
    weights = weights.reshape(bs, num_q, num_heads, L, P)
    loc = msda_sampling_locations(
        reference_points.astype(jnp.float32),
        sampling_offsets.astype(jnp.float32),
        spatial_shapes,
        num_heads,
    )  # [bs, q, heads, L, P, 2]

    starts = [0]
    for h, w in spatial_shapes:
        starts.append(starts[-1] + h * w)

    acc = jnp.zeros((bs, num_q, num_heads, ch), jnp.float32)
    for lvl, (H, W) in enumerate(spatial_shapes):
        v4 = _corner_pack(value[:, starts[lvl] : starts[lvl + 1]], H, W)
        # -> transposed table [bs*heads, 4ch, HW_pad] (keys minor)
        hw_pad = (-(H * W)) % 128
        vt = v4.transpose(0, 2, 3, 1).reshape(bs * num_heads, 4 * ch, H * W)
        if hw_pad:
            vt = jnp.pad(vt, ((0, 0), (0, 0), (0, hw_pad)))

        x = loc[..., lvl, :, 0] * W - 0.5
        y = loc[..., lvl, :, 1] * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        bx = jnp.clip(ix0, 0, max(W - 2, 0))
        by = jnp.clip(iy0, 0, max(H - 2, 0))
        dx = ix0 - bx
        dy = iy0 - by
        ax0 = (1 - wx1) * ((ix0 >= 0) & (ix0 < W))
        ax1 = wx1 * ((ix0 + 1 >= 0) & (ix0 + 1 < W))
        ay0 = (1 - wy1) * ((iy0 >= 0) & (iy0 < H))
        ay1 = wy1 * ((iy0 + 1 >= 0) & (iy0 + 1 < H))

        def slot(d, a0, a1):
            s0 = jnp.where(d == 0, a0, jnp.where(d == -1, a1, 0.0))
            s1 = jnp.where(d == 0, a1, jnp.where(d == 1, a0, 0.0))
            return s0, s1

        sx0, sx1 = slot(dx, ax0, ax1)
        sy0, sy1 = slot(dy, ay0, ay1)

        idx = by * W + bx  # [bs, q, heads, P]
        wl = weights[:, :, :, lvl]
        m4 = jnp.stack(
            [sx0 * sy0 * wl, sx1 * sy0 * wl, sx0 * sy1 * wl, sx1 * sy1 * wl],
            axis=-1,
        )  # [bs, q, heads, P, 4]

        # taps flattened per (bs, head): [bs*heads, q*P], padded to 1024
        idx_bh = idx.transpose(0, 2, 1, 3).reshape(bs * num_heads, num_q * P)
        tap_pad = (-(num_q * P)) % 1024
        if tap_pad:
            idx_bh = jnp.pad(idx_bh, ((0, 0), (0, tap_pad)))
        g = lane_gather(vt, idx_bh)  # [bs*heads, 4ch, taps_pad]
        g = g[:, :, : num_q * P].reshape(bs, num_heads, 4, ch, num_q, P)
        acc = acc + jnp.einsum(
            "bhxcqp,bqhpx->bqhc",
            g,
            m4.astype(g.dtype),
            preferred_element_type=jnp.float32,
        )
    return acc.reshape(bs, num_q, num_heads * ch).astype(value.dtype)
