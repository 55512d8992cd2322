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
import os
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


def _bilinear_slot_terms(loc_l, H, W):
    """Per-tap bilinear terms for one level with the clamped-window remap.

    loc_l [..., 2] normalized; returns (key [...] i32 in [0, H*W),
    m4 [..., 4] f32 slot weights for the packed corners (k, k+1, k+W, k+W+1)).
    A corner falling outside the clamped 2x2 window is always out-of-image
    (weight 0), so the remap is exact — same math as `_msda_chunk`.
    """
    key, slots = bilinear_slot_terms_pixels(
        loc_l[..., 0] * W - 0.5, loc_l[..., 1] * H - 0.5, H, W
    )
    return key, jnp.stack(slots, axis=-1)


def bilinear_slot_terms_pixels(x, y, H, W):
    """As `_bilinear_slot_terms` but with pixel-space sampling positions
    (shared by DCNv2's corner-packed gather, ops/dcn.py)."""
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
    key = by * W + bx
    return key, (sx0 * sy0, sx1 * sy0, sx0 * sy1, sx1 * sy1)


def _pack_bf16_halves(vt, ch):
    """[B, ch, keys] -> [B, ch/2, keys] uint32: channel halves (k, k+ch/2)
    packed as (hi, lo) — Mosaic dynamic_gather needs 32-bit data, and
    contiguous-half pairing avoids strided slicing here AND any
    un-interleave after the kernel (its hi/lo outputs are already channels
    [0, ch/2) and [ch/2, ch) in order)."""
    B, _, keys = vt.shape
    u16 = jax.lax.bitcast_convert_type(
        vt.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    u16 = u16.reshape(B, 2, ch // 2, keys)
    return (u16[:, 0] << 16) | u16[:, 1]


def _pack_int8_quarters(vt, ch, scale):
    """[B, ch, keys] f32-ish -> [B, ch/4, keys] uint32: channel quarters
    (k, k+ch/4, k+ch/2, k+3ch/4) quantized to int8 with the per-B `scale`
    and packed msb-first — the reference's int8 MSDA value payload
    (TensorRT/plugin/.../multiScaleDeformableAttnKernel.cu int8 path),
    with a dynamic per-(cam, head) scale instead of a calibrated
    per-tensor one.  Dequant is folded into the kernel's m4 weights
    (out = scale * sum m * q), so the kernel needs no epilogue."""
    B, _, keys = vt.shape
    q = jnp.clip(
        jnp.round(vt.astype(jnp.float32) / scale[:, None, None]), -127, 127
    ).astype(jnp.int32)
    u8 = (q & 0xFF).astype(jnp.uint32).reshape(B, 4, ch // 4, keys)
    return (u8[:, 0] << 24) | (u8[:, 1] << 16) | (u8[:, 2] << 8) | u8[:, 3]


def _pack_tables_from_vt(vt, spatial_shapes, packed, planes=4, tail_panels=0):
    """vt [B, ch, keys] (keys-minor, levels concatenated) -> (table
    [B, CHT, HWp], level_base panels, scale [B] or None): u32 packing
    (bf16 half-pairs, or int8 quarters with a dynamic per-B scale when
    packed == 'int8') FIRST, then corner packing via minor-axis rolls of
    the packed words.  Pack-before-roll runs the pack at 1x data and the
    corner materialization on the narrow u32 words — the roll-first
    order cost ~3x the HBM traffic per cross layer (profiler trace: 764 MB
    kLoop intermediates).  Shared by MSDA and the Pallas DCNv2 path.

    planes=4 stores all bilinear corners (k, k+1, k+W, k+W+1); planes=2
    stores (k, k+W) only — half the table — for the kernel's two_plane
    mode, which gathers the +1 corners via a second lane variant."""
    B, ch, num_keys = vt.shape
    scale = None
    if packed == "int8":
        amax = jnp.max(jnp.abs(vt.astype(jnp.float32)), axis=(1, 2))
        scale = jnp.maximum(amax, 1e-12) / 127.0
        w = _pack_int8_quarters(vt, ch, scale)  # [B, ch/4, keys]
    elif packed:
        w = _pack_bf16_halves(vt, ch)  # [B, ch/2, keys]
    else:
        w = vt.astype(jnp.float32)
    return (*_roll_pad_levels(w, spatial_shapes, planes, tail_panels), scale)


def _pack_tables_from_xlast(xl, ch_group, spatial_shapes, packed, planes=4):
    """Channel-LAST table build: xl [N, keys, C] (an NHWC feature map
    flattened over H*W) -> the same (table, level_base, scale) contract as
    `_pack_tables_from_vt` with B = N * (C // ch_group), n-major.

    Packs the u32 words along the resident minor channel axis FIRST and
    only then transposes keys-minor — the transpose moves the packed words
    (half the elements for bf16 pairs, a quarter for int8), where
    transpose-then-pack would relayout the raw feature map.  Word layout
    matches `_pack_bf16_halves` / `_pack_int8_quarters` exactly: halves
    pair channels (k, k+chg/2), quarters pack (k, k+chg/4, k+chg/2,
    k+3chg/4) msb-first, per channel group."""
    N, keys, C = xl.shape
    G = C // ch_group
    scale = None
    if packed == "int8":
        amax = jnp.max(jnp.abs(xl.astype(jnp.float32)), axis=1)  # [N, C]
        amax = amax.reshape(N, G, ch_group).max(-1)
        scale = jnp.maximum(amax, 1e-12) / 127.0  # [N, G]
        q = jnp.clip(
            jnp.round(
                xl.astype(jnp.float32)
                / jnp.repeat(scale, ch_group, axis=1)[:, None, :]
            ),
            -127,
            127,
        ).astype(jnp.int32)
        u8 = (q & 0xFF).astype(jnp.uint32).reshape(N, keys, G, 4, ch_group // 4)
        w = (
            (u8[..., 0, :] << 24)
            | (u8[..., 1, :] << 16)
            | (u8[..., 2, :] << 8)
            | u8[..., 3, :]
        )  # [N, keys, G, chg/4]
        scale = scale.reshape(N * G)
    elif packed:
        u16 = jax.lax.bitcast_convert_type(
            xl.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        u16 = u16.reshape(N, keys, G, 2, ch_group // 2)
        w = (u16[..., 0, :] << 16) | u16[..., 1, :]  # [N, keys, G, chg/2]
    else:
        w = xl.astype(jnp.float32).reshape(N, keys, G, ch_group)
    w = w.transpose(0, 2, 3, 1).reshape(N * G, -1, keys)  # [B, ch/sub, keys]
    return (*_roll_pad_levels(w, spatial_shapes, planes), scale)


def _roll_pad_levels(w, spatial_shapes, planes, tail_panels=0):
    """Corner-pack packed words `w` [B, ch/sub, keys] via minor-axis rolls,
    pad each level's key axis to a 128 multiple, concatenate levels.
    Returns (table [B, planes*ch/sub, HWp], level_base panels).

    tail_panels > 0 appends that many extra zero panels to the LAST level's
    pad — the multi-panel sweep's slack (msda_gather panel_width) — so it
    rides the existing level-concat fusion instead of re-materializing the
    whole table in a separate jnp.pad (measured 1.15 ms/table-build at base
    SCA shapes, trace 2026-08-20)."""
    starts = [0]
    for h, wd in spatial_shapes:
        starts.append(starts[-1] + h * wd)
    tables = []
    level_base = []
    panels = 0
    last = len(spatial_shapes) - 1
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = w[:, :, starts[lvl] : starts[lvl + 1]]
        hw_pad = (-(H * W)) % 128
        tail = tail_panels * 128 if lvl == last else 0
        # pad BEFORE the corner rolls: 1/planes the data of padding the
        # rolled concat, and XLA fuses the pad into the upstream pack
        # (trace 2026-08-20: the pad-after-concat re-materialized the whole
        # table, 4.9 ms/frame on the DCN path alone).  Exact: a roll on the
        # padded axis replaces the wrap-around rows with zeros, and wrap
        # rows are always weight-masked (corner outside the image).
        if hw_pad or tail:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, hw_pad + tail)))
        rolls = (0, -W) if planes == 2 else (0, -1, -W, -(W + 1))
        v4 = jnp.concatenate(
            [v if r == 0 else jnp.roll(v, r, axis=2) for r in rolls], axis=1
        )  # [B, planes*ch/sub, HWp]
        tables.append(v4)
        level_base.append(panels)
        panels += (H * W + hw_pad) // 128
    return jnp.concatenate(tables, axis=-1), level_base


def _build_tables(value, spatial_shapes, packed):
    """value [bs, keys, heads, ch] -> (table [bs*heads, CHT, HWp],
    level_base panels, scale).  One transpose of the raw value (keys ->
    minor), then corner packing — the corner-packed-then-transpose order
    would cost 4x the relayout traffic."""
    bs, num_keys, num_heads, ch = value.shape
    vt = value.transpose(0, 2, 3, 1).reshape(bs * num_heads, ch, num_keys)
    return _pack_tables_from_vt(vt, spatial_shapes, packed)


def _prep_taps(
    reference_points, sampling_offsets, attention_weights, spatial_shapes,
    num_heads, level_base, row_group=1,
):
    """Tap rows for the sorted kernel from q-MAJOR projections: transposes
    each projection output to query-minor and delegates to the q-minor core
    (`_prep_taps_qminor`).  Callers that can produce q-minor projections
    directly (QDense q_minor=True) skip these relayouts entirely.
    """
    bs, num_q = reference_points.shape[:2]
    L = len(spatial_shapes)
    P = attention_weights.shape[-1] // L
    ppg = reference_points.shape[-1] // 2

    offT = (
        sampling_offsets.astype(jnp.float32)
        .transpose(0, 2, 3, 1)
        .reshape(bs, num_heads, L, P // ppg, ppg, 2, num_q)
    )
    attnT = attention_weights.astype(jnp.float32).transpose(0, 2, 3, 1)
    refT = reference_points.astype(jnp.float32).reshape(
        bs, num_q, ppg, 2
    ).transpose(0, 2, 3, 1)  # [bs, ppg, 2, q]
    return _prep_taps_qminor(
        refT, offT, attnT, spatial_shapes, num_heads, level_base, row_group
    )


def _prep_taps_qminor(
    refT, offT, attnT, spatial_shapes, num_heads, level_base, row_group=1,
    two_plane=False, m4_dtype=jnp.float32, scale=None,
):
    """Tap rows for the sorted kernel, query-MINOR layout throughout.

    refT [bs, ppg, 2, num_q] f32; offT [bs, heads, L, P//ppg, ppg, 2, num_q]
    f32; attnT [bs, heads, L*P, num_q] f32 RAW logits (softmax here, over
    the L*P axis — matching the fused-op contract).

    `row_group` consecutive rows (points of one level) share one panel
    sweep in the kernel, so pmin/pspan are the UNION over each group.

    two_plane=True: lane gains a variant axis [.., rows, 2, 128] carrying
    (key, key+1) for the kernel's half-size (k, k+W)-plane tables; spans
    union both variants (+1 panel only when a group's max key sits on a
    panel edge — ~1/128 of groups).

    Returns lane [B, rows, (2,) QB*128] i32, m4 [B, rows, 4, QB*128] f32,
    pmin/pspan [B, QB, rows//row_group] i32 — lane/m4 stay query-minor with
    the block axis folded into lanes, i.e. exactly the layout the projection
    outputs arrive in, so the prep does NO relayout of its two big tensors.
    """
    bs, num_heads_, L = offT.shape[:3]
    num_q = refT.shape[-1]
    P = attnT.shape[2] // L
    rows = L * P
    B = bs * num_heads
    ppg = refT.shape[1]
    q_pad = (-num_q) % 128
    QB = (num_q + q_pad) // 128

    wT = jax.nn.softmax(attnT, axis=2).reshape(bs, num_heads, L, P, num_q)
    if scale is not None:
        # int8 table dequant folded into the attention weights BEFORE the
        # corner products — m4 is linear in wT, and folding here lets the
        # whole slot/stack chain emit m4_dtype directly (no f32 m4 tensor
        # ever materializes; scale > 0 so the dead-group sign test below
        # is unchanged)
        wT = wT * scale.reshape(bs, num_heads, 1, 1, 1)

    if q_pad:
        pad = ((0, 0),) * (offT.ndim - 1) + ((0, q_pad),)
        offT = jnp.pad(offT, pad)
        wT = jnp.pad(wT, ((0, 0),) * 4 + ((0, q_pad),))
        refT = jnp.pad(refT, ((0, 0),) * 3 + ((0, q_pad),), constant_values=2.0)

    lanes, m4s, pmins, pspans = [], [], [], []
    qp = num_q + q_pad
    for lvl, (H, W) in enumerate(spatial_shapes):
        # sampling locations in pixels (msda_sampling_locations semantics)
        rx = refT[:, :, 0][:, None, None]  # [bs, 1, 1, ppg, q]
        ry = refT[:, :, 1][:, None, None]
        x = (rx + offT[:, :, lvl, :, :, 0] / W) * W - 0.5
        y = (ry + offT[:, :, lvl, :, :, 1] / H) * H - 0.5
        # z-MAJOR row order: [bs, heads, P//ppg, ppg, q] -> [bs, heads,
        # ppg, P//ppg, q] -> [bs, heads, P, q].  Taps sharing a z-anchor
        # land in the same union-sweep row group — z-anchors of one query
        # project far apart vertically (different pillar heights), so
        # grouping across z would blow the union span (tools/span_study.py:
        # z-major RG=4 is ~1.3x fewer panel visits than tap-major).
        x = x.transpose(0, 1, 3, 2, 4).reshape(bs, num_heads, P, qp)
        y = y.transpose(0, 1, 3, 2, 4).reshape(bs, num_heads, P, qp)
        key, slots = bilinear_slot_terms_pixels(x, y, H, W)
        key = key + level_base[lvl] * 128
        wl = (
            wT[:, :, lvl]
            .reshape(bs, num_heads, P // ppg, ppg, qp)
            .transpose(0, 1, 3, 2, 4)
            .reshape(bs, num_heads, P, qp)
        )  # [bs, heads, P, q] in the same z-major order
        m4 = jnp.stack(
            [(s * wl).astype(m4_dtype) for s in slots], axis=3
        )  # [bs, h, P, 4, q]
        lanes.append(key)
        m4s.append(m4)
    key = jnp.stack(lanes, axis=2)  # [bs, h, L, P, qp]
    m4 = jnp.stack(m4s, axis=2)     # [bs, h, L, P, 4, qp]
    # query-minor kernel layout, NO relayout: the QB axis stays folded into
    # the minor (lane) axis — the kernel's BlockSpec slices 128-lane windows
    key = key.reshape(B, rows, qp)
    m4 = m4.reshape(B, rows, 4, qp)

    if two_plane:
        # second lane variant: key+1 (the +1 corners), clamped into the
        # padded table — clamped taps always carry zero corner weight
        total_keys = (level_base[-1] * 128) + (
            -(-spatial_shapes[-1][0] * spatial_shapes[-1][1] // 128) * 128
        )
        key = jnp.stack(
            [key, jnp.minimum(key + 1, total_keys - 1)], axis=2
        )  # [B, rows, 2, qp]

    ng = rows // row_group
    panel = key // 128
    # per (group, query-block) stats: [B, ng, rg(*LV), QB, 128] -> [B, QB, ng]
    pg = panel.reshape(B, ng, -1, QB, 128)
    pmin = pg.min(axis=(2, 4)).astype(jnp.int32).transpose(0, 2, 1)
    pmax = pg.max(axis=(2, 4)).astype(jnp.int32).transpose(0, 2, 1)
    pspan = pmax - pmin + 1
    # dead-group skip: a row group whose every corner weight is zero (all
    # taps outside the image — e.g. a whole z-anchor projecting above the
    # camera for this 128-query block) contributes exactly 0, but its
    # border-clamped keys would still sweep 1-2 panels.  span=0 makes the
    # kernel's fori_loop skip the group entirely.  m4 >= 0 always (bilinear
    # slots x softmax weights), so max==0 detects dead exactly.
    galive = (
        m4.astype(jnp.float32).reshape(B, ng, -1, QB, 128)
        .max(axis=(2, 4)).transpose(0, 2, 1) > 0
    )
    pspan = jnp.where(galive, pspan, 0)
    # pm broadcast back to the key layout (fused elementwise, no relayout):
    # [B, QB, ng] -> [B, ng, QB] -> rows/128-lane expansion
    pm = jnp.repeat(pmin.transpose(0, 2, 1), row_group, axis=1)  # [B, rows, QB]
    pm = jnp.broadcast_to(pm[..., None], (B, rows, QB, 128)).reshape(B, rows, qp)
    if two_plane:
        pm = pm[:, :, None, :]
    lane = (key - pm * 128).astype(jnp.int32)
    return lane, m4, pmin, pspan


@functools.partial(
    jax.jit,
    static_argnames=(
        "spatial_shapes", "packed", "interpret", "key_groups", "row_group"
    ),
)
def multi_scale_deformable_attn_sorted(
    value: jax.Array,
    reference_points: jax.Array,
    sampling_offsets: jax.Array,
    attention_weights: jax.Array,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    packed: bool = True,
    interpret: bool = False,
    key_groups: int | None = None,
    row_group: int | None = None,
) -> jax.Array:
    """MSDA through the Pallas sorted-tap gather kernel (pallas/msda_gather).

    Same contract and semantics as `multi_scale_deformable_attn` (raw-logit
    softmax inside, corner-packed bilinear, torch grid-sample border rules).
    EXACT for any query order; fastest when callers present queries sorted
    by projected image position so each 128-tap row clusters in few panels
    (the encoder's camera compaction provides that order).

    packed=True stores the tables as u32 bf16-pairs (TPU production path:
    half the VMEM + vregs); packed='int8' quantizes the value payload to
    u32 int8-quads with a dynamic per-(cam, head) scale (the reference's
    int8 MSDA plugin contract — quarter the VMEM, half the gather rows of
    bf16); packed=False keeps f32 tables (fp32-exact, interpret tests).
    """
    bs, num_keys, num_heads, ch = value.shape
    L = len(spatial_shapes)
    P = attention_weights.shape[-1] // L
    ppg = reference_points.shape[-1] // 2

    vt = value.transpose(0, 2, 3, 1).reshape(bs * num_heads, ch, num_keys)
    offT = (
        sampling_offsets.astype(jnp.float32)
        .transpose(0, 2, 3, 1)
        .reshape(bs, num_heads, L, P // ppg, ppg, 2, reference_points.shape[1])
    )
    attnT = attention_weights.astype(jnp.float32).transpose(0, 2, 3, 1)
    refT = reference_points.astype(jnp.float32).reshape(
        bs, -1, ppg, 2
    ).transpose(0, 2, 3, 1)
    return _sorted_core(
        vt, refT, offT, attnT, spatial_shapes, num_heads,
        packed=packed, interpret=interpret, key_groups=key_groups,
        row_group=row_group, out_dtype=value.dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "spatial_shapes", "num_heads", "packed", "interpret", "key_groups",
        "row_group", "out_dtype", "out_q_minor",
    ),
)
def multi_scale_deformable_attn_sorted_qm(
    value_t: jax.Array,   # [bs, heads*ch, num_keys] channel-second-minor
    ref_t: jax.Array,     # [bs, ppg, 2, num_q] f32 normalized
    off_t: jax.Array,     # [bs, heads*L*P*2, num_q] raw pixel offsets
    attn_t: jax.Array,    # [bs, heads*L*P, num_q] RAW logits
    spatial_shapes: Tuple[Tuple[int, int], ...],
    num_heads: int,
    packed: bool = True,
    interpret: bool = False,
    key_groups: int | None = None,
    row_group: int | None = None,
    out_dtype=jnp.bfloat16,
    out_q_minor: bool = False,
) -> jax.Array:
    """Query-minor entry to the sorted MSDA op: every input arrives in the
    layout the kernel wants (value channel-minor for the tables, projections
    query-minor for the tap prep), so none of the q-major path's large
    relayouts exist.  Produce the inputs with `QDense(..., q_minor=True)` —
    the transpose then folds into the projection matmul for free.

    Returns [bs, num_q, heads*ch] in `out_dtype`.
    """
    bs = value_t.shape[0]
    ch = value_t.shape[1] // num_heads
    L = len(spatial_shapes)
    P = attn_t.shape[1] // (num_heads * L)
    ppg = ref_t.shape[1]
    num_q = ref_t.shape[-1]

    vt = value_t.reshape(bs * num_heads, ch, value_t.shape[-1])
    offT = off_t.astype(jnp.float32).reshape(
        bs, num_heads, L, P // ppg, ppg, 2, num_q
    )
    attnT = attn_t.astype(jnp.float32).reshape(bs, num_heads, L * P, num_q)
    return _sorted_core(
        vt, ref_t.astype(jnp.float32), offT, attnT, spatial_shapes, num_heads,
        packed=packed, interpret=interpret, key_groups=key_groups,
        row_group=row_group, out_dtype=out_dtype, out_q_minor=out_q_minor,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sorted_diff(static, value, reference_points, sampling_offsets, attention_weights):
    (spatial_shapes, packed, key_groups, row_group) = static
    return multi_scale_deformable_attn_sorted(
        value, reference_points, sampling_offsets, attention_weights,
        spatial_shapes, packed=packed, key_groups=key_groups,
        row_group=row_group,
    )


def _sorted_diff_fwd(static, value, reference_points, sampling_offsets, attention_weights):
    out = _sorted_diff(static, value, reference_points, sampling_offsets, attention_weights)
    return out, (value, reference_points, sampling_offsets, attention_weights)


def _sorted_diff_bwd(static, res, g):
    (spatial_shapes, _packed, _kg, _rg) = static
    value, reference_points, sampling_offsets, attention_weights = res

    def f(v, r, o, a):
        return multi_scale_deformable_attn(v, r, o, a, spatial_shapes).astype(g.dtype)

    _, vjp = jax.vjp(f, value, reference_points, sampling_offsets, attention_weights)
    return vjp(g)


_sorted_diff.defvjp(_sorted_diff_fwd, _sorted_diff_bwd)


def multi_scale_deformable_attn_sorted_diff(
    value, reference_points, sampling_offsets, attention_weights,
    spatial_shapes, packed=True, key_groups=None, row_group=None,
):
    """Differentiable q-major sorted MSDA: Pallas forward, XLA backward
    (the VJP of the chunked jnp path — same contract, tap-exact forward
    agreement).  See multi_scale_deformable_attn_sorted_qm_diff."""
    static = (tuple(spatial_shapes), packed, key_groups, row_group)
    return _sorted_diff(static, value, reference_points, sampling_offsets, attention_weights)


def _qm_to_qmajor(value_t, ref_t, off_t, attn_t, spatial_shapes, num_heads):
    """Invert the q-minor layout back to the q-major fused-op contract
    (exact inverses of multi_scale_deformable_attn_sorted's reshapes)."""
    bs = value_t.shape[0]
    ch = value_t.shape[1] // num_heads
    num_q = ref_t.shape[-1]
    ppg = ref_t.shape[1]
    L = len(spatial_shapes)
    P = attn_t.shape[1] // (num_heads * L)
    value = value_t.reshape(bs, num_heads, ch, -1).transpose(0, 3, 1, 2)
    reference_points = ref_t.transpose(0, 3, 1, 2).reshape(bs, num_q, 1, ppg * 2)
    sampling_offsets = off_t.reshape(bs, num_heads, L * P * 2, num_q).transpose(0, 3, 1, 2)
    attention_weights = attn_t.reshape(bs, num_heads, L * P, num_q).transpose(0, 3, 1, 2)
    return value, reference_points, sampling_offsets, attention_weights


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sorted_qm_diff(static, value_t, ref_t, off_t, attn_t):
    (spatial_shapes, num_heads, packed, key_groups, row_group, dt, oqm) = static
    return multi_scale_deformable_attn_sorted_qm(
        value_t, ref_t, off_t, attn_t, spatial_shapes, num_heads,
        packed=packed, key_groups=key_groups, row_group=row_group,
        out_dtype=jnp.dtype(dt), out_q_minor=oqm,
    )


def _sorted_qm_diff_fwd(static, value_t, ref_t, off_t, attn_t):
    return _sorted_qm_diff(static, value_t, ref_t, off_t, attn_t), (
        value_t, ref_t, off_t, attn_t,
    )


def _sorted_qm_diff_bwd(static, res, g):
    (spatial_shapes, num_heads, _packed, _kg, _rg, dt, oqm) = static
    value_t, ref_t, off_t, attn_t = res

    def f(v, r, o, a):
        value, rp, so, aw = _qm_to_qmajor(v, r, o, a, spatial_shapes, num_heads)
        out = multi_scale_deformable_attn(value, rp, so, aw, spatial_shapes)
        if oqm:  # match the fwd's q-minor output orientation
            out = out.swapaxes(-1, -2)
        return out.astype(jnp.dtype(dt))

    _, vjp = jax.vjp(f, value_t, ref_t, off_t, attn_t)
    return vjp(g)


_sorted_qm_diff.defvjp(_sorted_qm_diff_fwd, _sorted_qm_diff_bwd)


def multi_scale_deformable_attn_sorted_qm_diff(
    value_t, ref_t, off_t, attn_t, spatial_shapes, num_heads,
    packed=True, key_groups=None, row_group=None, out_dtype=jnp.bfloat16,
    out_q_minor=False,
):
    """Differentiable sorted MSDA (VERDICT r2 item 5): the Pallas sorted-tap
    kernel forward (inference speed) with an XLA backward — the VJP of the
    chunked jnp path on the SAME q-minor operands.  The sorted forward is
    tap-exact vs the jnp path (tests/test_pallas.py), so the gradients are
    consistent; the reference trains through mmcv's ms_deform_attn_backward
    CUDA kernel the same way (det2trt/models/functions/
    multi_scale_deformable_attn.py:5-7).

    Inference cost is unchanged (custom_vjp adds nothing to the primal); use
    anywhere multi_scale_deformable_attn_sorted_qm is used.
    """
    static = (
        tuple(spatial_shapes), num_heads, packed, key_groups, row_group,
        jnp.dtype(out_dtype).name, out_q_minor,
    )
    return _sorted_qm_diff(static, value_t, ref_t, off_t, attn_t)


def _sorted_core(
    vt, refT, offT, attnT, spatial_shapes, num_heads,
    *, packed, interpret, key_groups, row_group, out_dtype,
    out_q_minor=False,
):
    from .pallas.msda_gather import msda_gather_sorted

    # Pallas has no compiled CPU lowering — fall back to interpret mode off
    # TPU so models configured with msda_impl='sorted' stay runnable (and
    # CPU-testable) everywhere.
    interpret = interpret or jax.default_backend() != "tpu"

    bs = offT.shape[0]
    ch = vt.shape[1]
    L = len(spatial_shapes)
    P = attnT.shape[2] // L
    rows = L * P
    B = bs * num_heads
    num_q = refT.shape[-1]
    QB = (num_q + (-num_q) % 128) // 128
    sub = 4 if packed == "int8" else (2 if packed else 1)

    # two-plane tables: half the VMEM per table block at identical
    # per-visit gather cost on paper — MEASURED slower on v5e when applied
    # globally (1.73 vs 1.91 FPS base bf16, ab_kernel_layouts 2026-08-19:
    # the dual-lane gather's extra row-combine work beats the VMEM saving)
    # — EXCEPT when halving the table avoids a key-range split entirely:
    # the temporal self-attention table (10.3 MB 4-plane at base) otherwise
    # runs every query block through TWO kernel passes.  Auto rule: use
    # two-plane iff the 4-plane block would split and the 2-plane one fits.
    # MSDA_TWO_PLANE=0/1 still forces either layout for A/B.
    env_tp = os.environ.get("MSDA_TWO_PLANE", "")
    keys_pad = sum((h * w + (-(h * w)) % 128) for h, w in spatial_shapes)
    blk4 = (4 * ch // sub) * keys_pad * 4
    if env_tp:
        two_plane = env_tp == "1"
    else:
        two_plane = blk4 > 8_000_000 and blk4 // 2 <= 8_000_000

    # v5e VMEM is ~16 MB scoped and the table block is double-buffered
    # across the grid's (cam*head) axis: when one table block would exceed
    # ~8 MB, split it along the KEY axis into panel ranges.  Each tap lands
    # in exactly one range, so span clipping + the whole-block alive skip
    # make the off-range passes nearly free — unlike the earlier corner
    # split, which re-paid every panel visit per corner group (temporal
    # self-attention ran 2x the visits for its 10.3 MB table).
    # (sizes derived from spatial_shapes so the split decision — and the
    # panel_width tail-pad below — can be made BEFORE the table build)
    CHT_ = (2 if two_plane else 4) * ch // sub
    blk_bytes = CHT_ * keys_pad * 4
    panels_total = keys_pad // 128
    # MSDA_KG: env override of the key-range split count (A/B harness)
    n_splits = (
        key_groups
        or int(os.environ.get("MSDA_KG", "0"))
        or max(1, -(-blk_bytes // 8_000_000))
    )
    n_splits = min(n_splits, panels_total)

    # panels per sweep iteration (see np_default below); decided here so a
    # single-kernel call can bake the (NP-1)-panel slack into the table
    # build's level concat instead of a whole-table re-pad in the kernel
    L_ = len(spatial_shapes)
    np_default = 4 if L_ > 1 else 1
    npw = int(os.environ.get("MSDA_NP", "0")) or np_default
    tail = (npw - 1) if (n_splits == 1 and not two_plane) else 0
    table, level_base, scale = _pack_tables_from_vt(
        vt, spatial_shapes, packed, planes=2 if two_plane else 4,
        tail_panels=tail,
    )
    nrows = 4 * ch // sub
    # union-sweep row group: as many points as fit the per-visit register
    # budget (row_group * nrows <= 256 gathered sublanes), but never across
    # z-anchor boundaries — z-anchors of one query project far apart
    # vertically, so a union over them sweeps the whole image column
    # (measured: int8's auto rg=8 across 4 z's made the kernel SLOWER than
    # bf16 in-model despite halving the gathered sublanes).
    ppg = refT.shape[1]
    rg_cap = max(1, P // ppg) if ppg > 1 else P
    rg = 1
    for d in range(2, P + 1):
        if P % d == 0 and d <= rg_cap and d * nrows <= 256:
            rg = d
    if row_group is not None:
        rg = row_group
    elif os.environ.get("MSDA_RG"):
        # env override of the union-sweep row group (A/B harness); clamped
        # to a divisor of `rows` (the kernel requires rows % rg == 0)
        rg = int(os.environ["MSDA_RG"])
        while rows % rg:
            rg -= 1

    # packed (bf16/int8 table) paths carry m4 in bf16 — the [0,1] corner
    # x attention weights match the reference fp16 plugin's weight
    # precision, and m4 is the largest per-layer prep tensor.  The f32
    # table path keeps f32 m4 (fp32-exactness contract for tests).  Both
    # the dtype and the int8 dequant scale are folded INTO the prep's slot
    # products so no f32 m4 (346 MB/layer at base cross shapes) ever
    # materializes (trace 2026-08-20: the post-prep scale-mul + cast cost
    # ~6 ms/frame of pure copies).
    lane, m4, pmin, pspan = _prep_taps_qminor(
        refT, offT, attnT, spatial_shapes, num_heads, level_base, row_group=rg,
        two_plane=two_plane,
        m4_dtype=jnp.bfloat16 if packed else jnp.float32,
        scale=scale,
    )
    # whole-block skip flags: a 128-query block whose every corner weight is
    # zero (the compaction's invisible tail) is written as zeros by the
    # kernel without sweeping — exact, and per-camera dynamic.
    Bq = m4.shape[0]
    qp_all = m4.shape[-1]
    alive = (
        jnp.abs(m4.astype(jnp.float32))
        .reshape(Bq, rows * 4, qp_all // 128, 128).sum(axis=(1, 3)) > 0
    ).astype(jnp.int32)  # [B, QB]

    # query blocks per program: amortizes the ~1.2 us program fixed cost
    # over several blocks.  MEASURED no effect on v5e at base shapes
    # (1.905 vs 1.914 FPS for 8 vs 1, ab_kernel_layouts 2026-08-19 —
    # Mosaic already overlaps program launches), so default to the
    # simpler one-block-per-program layout; MSDA_QBB>1 kept for A/B.
    qbb = min(int(os.environ.get("MSDA_QBB", "1")), QB)

    # panels per sweep iteration: the multi-level cross-attention rows span
    # ~10 panels per group (tools/span_study.py), and the per-iteration loop
    # machinery is ~70ns of the ~150ns visit — 4 panels/iteration is ~1.45x
    # at those spans (tools/kernel_bench3.py, v5e 2026-08-19).  Single-level
    # callers (temporal BEV, decoder) have span ~1-2 where the over-sweep
    # LOSES (span1: 463 vs 600 ns/group), so NP=1 there.  MSDA_NP overrides.
    # (npw itself is computed above, before the table build.)

    if n_splits == 1:
        out = msda_gather_sorted(
            table, lane, m4, pmin, pspan,
            rows=rows, ch=ch, corners=4, packed=packed, interpret=interpret,
            row_group=rg, alive=alive, q_blocks=qbb, two_plane=two_plane,
            panel_width=npw, tail_padded=tail > 0,
        )  # [B, ch, QB*128] f32 (channels already in order — half pairing)
    else:
        per = -(-panels_total // n_splits)
        pmax = pmin + pspan - 1
        B_ = lane.shape[0]
        rows_ = rows
        qp_ = lane.shape[-1]
        out = None
        for h in range(n_splits):
            h0, h1 = h * per, min((h + 1) * per, panels_total)
            lo = jnp.clip(pmin, h0, h1 - 1)
            hi = jnp.clip(pmax, h0, h1 - 1)
            # groups with no panel inside [h0, h1) sweep nothing; taps whose
            # panel falls outside the clipped window never match a sweep
            # position (panel_id <0 or >span), so no m4 masking is needed.
            span_h = jnp.where((pmax < h0) | (pmin >= h1), 0, hi - lo + 1)
            # [B, QB, ng] -> lane layout [B, rows, (2,) qp] (fused broadcast)
            shift = jnp.repeat((pmin - lo).transpose(0, 2, 1), rg, axis=1)
            shift = jnp.broadcast_to(
                shift[..., None], (B_, rows_, qp_ // 128, 128)
            ).reshape(B_, rows_, qp_)
            if two_plane:
                shift = shift[:, :, None, :]
            lane_h = lane + shift * 128
            alive_h = alive * (span_h.max(axis=-1) > 0)
            part = msda_gather_sorted(
                table[:, :, h0 * 128 : h1 * 128], lane_h, m4, lo - h0, span_h,
                rows=rows, ch=ch, corners=4, packed=packed,
                interpret=interpret, row_group=rg, alive=alive_h,
                q_blocks=qbb, two_plane=two_plane, panel_width=npw,
            )
            out = part if out is None else out + part
    if out_q_minor:
        # [bs*heads, ch, qp] -> [bs, heads*ch, num_q]: a pure VIEW (heads is
        # already channel-major) — callers consume it with
        # QDense(q_minor='in'), so the q-major relayout never happens
        return out.reshape(bs, num_heads * ch, QB * 128)[..., :num_q].astype(out_dtype)
    out = out.reshape(bs, num_heads, ch, QB * 128).transpose(0, 3, 1, 2)
    return out[:, :num_q].reshape(bs, num_q, num_heads * ch).astype(out_dtype)
