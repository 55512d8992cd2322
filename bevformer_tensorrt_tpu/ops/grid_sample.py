"""Grid sampling (2D and 3D) with PyTorch-exact semantics, in pure jnp.

TPU-native equivalent of the reference's GridSampler2DTRT/3DTRT plugins
(reference: TensorRT/plugin/grid_sampler/gridSamplerKernel.cu, exposed via
det2trt/models/functions/grid_sampler.py).  Supports bilinear / nearest /
bicubic interpolation and zeros / border / reflection padding with
align_corners True/False, matching `torch.nn.functional.grid_sample`.

Design notes (TPU-first):
  * The sampler is expressed as vectorized gathers (`jnp.take_along_axis`
    over a flattened spatial axis) + VPU blends.  XLA lowers this onto the
    TPU gather unit; all shapes are static so the whole thing fuses under
    jit.  A Pallas variant for the MSDA-style hot path lives in
    `ops/pallas/`.
  * The reference pre-scales grids by 10 on the Python side so FP16 grids
    keep precision and divides back inside the CUDA kernel
    (det2trt/models/functions/grid_sampler.py:30).  That hack exists only
    because of FP16's 1/1024 ulp at 10.0; on TPU we compute coordinates in
    f32 regardless of data dtype, so the x10 convention is unnecessary and
    deliberately NOT part of this API.  `scale` is provided for parity
    testing.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

MODES = ("bilinear", "nearest", "bicubic")
PADDINGS = ("zeros", "border", "reflection")

_CUBIC_A = -0.75  # torch's cubic convolution alpha


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(x: jax.Array, lo: float, hi: float) -> jax.Array:
    """Reflect a continuous coordinate into [lo, hi] (torch semantics)."""
    if hi <= lo:
        return jnp.zeros_like(x)
    span = hi - lo
    x = jnp.abs(x - lo) % (2.0 * span)
    return jnp.where(x > span, 2.0 * span - x, x) + lo


def _compute_coords(x: jax.Array, size: int, padding_mode: str, align_corners: bool) -> jax.Array:
    """Apply border/reflection coordinate transforms (zeros: identity)."""
    if padding_mode == "border":
        return jnp.clip(x, 0.0, size - 1)
    if padding_mode == "reflection":
        if align_corners:
            x = _reflect(x, 0.0, float(size - 1))
        else:
            x = _reflect(x, -0.5, size - 0.5)
        return jnp.clip(x, 0.0, size - 1)
    return x


def _gather_2d(inp_flat: jax.Array, ix: jax.Array, iy: jax.Array, H: int, W: int) -> jax.Array:
    """Gather inp_flat[n, c, iy*W+ix] with zeros for out-of-bounds taps.

    inp_flat: [N, C, H*W]; ix, iy: [N, ...] int32. Returns [N, C, ...].
    """
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    out_shape = idx.shape[1:]
    idx2 = idx.reshape(idx.shape[0], 1, -1)
    g = jnp.take_along_axis(inp_flat, idx2, axis=2)
    g = g.reshape(inp_flat.shape[0], inp_flat.shape[1], *out_shape)
    return g * valid[:, None].astype(inp_flat.dtype)


def _gather_3d(
    inp_flat: jax.Array, ix: jax.Array, iy: jax.Array, iz: jax.Array, D: int, H: int, W: int
) -> jax.Array:
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) & (iz >= 0) & (iz < D)
    idx = (jnp.clip(iz, 0, D - 1) * H + jnp.clip(iy, 0, H - 1)) * W + jnp.clip(ix, 0, W - 1)
    out_shape = idx.shape[1:]
    idx2 = idx.reshape(idx.shape[0], 1, -1)
    g = jnp.take_along_axis(inp_flat, idx2, axis=2)
    g = g.reshape(inp_flat.shape[0], inp_flat.shape[1], *out_shape)
    return g * valid[:, None].astype(inp_flat.dtype)


def _cubic_weights(t: jax.Array):
    A = _CUBIC_A
    t1 = t + 1.0
    w0 = ((A * t1 - 5.0 * A) * t1 + 8.0 * A) * t1 - 4.0 * A
    w1 = ((A + 2.0) * t - (A + 3.0)) * t * t + 1.0
    s = 1.0 - t
    w2 = ((A + 2.0) * s - (A + 3.0)) * s * s + 1.0
    w3 = 1.0 - w0 - w1 - w2
    return w0, w1, w2, w3


@functools.partial(jax.jit, static_argnames=("mode", "padding_mode", "align_corners"))
def grid_sample_2d(
    inp: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jax.Array:
    """2D grid sample, torch-exact.

    Args:
      inp:  [N, C, H, W]
      grid: [N, Hout, Wout, 2], values in [-1, 1] (x, y order).
    Returns:
      [N, C, Hout, Wout]
    """
    assert mode in MODES and padding_mode in PADDINGS
    N, C, H, W = inp.shape
    out_dtype = inp.dtype
    cdtype = jnp.float32
    grid = grid.astype(cdtype)
    # coordinates are ALWAYS f32 (see module docstring), but the data path
    # keeps bf16 inputs in bf16: converting the whole feature map to f32
    # up front costs more than the op itself at deploy shapes (OPBENCH_r3:
    # bf16 0.396 ms vs fp32 0.164 — the 0.23 ms was the input convert+copy),
    # and bf16 gathers move half the bytes.  Bicubic keeps f32 blends (its
    # overshooting negative weights lose real precision in bf16).
    blend_dtype = jnp.bfloat16 if inp.dtype == jnp.bfloat16 and mode != "bicubic" else cdtype
    inp_flat = inp.reshape(N, C, H * W).astype(blend_dtype)

    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    if mode == "nearest":
        x = _compute_coords(x, W, padding_mode, align_corners)
        y = _compute_coords(y, H, padding_mode, align_corners)
        # torch uses nearbyint (round-half-to-even), as does jnp.round.
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        out = _gather_2d(inp_flat, ix, iy, H, W)
        return out.astype(out_dtype)

    if mode == "bilinear":
        x = _compute_coords(x, W, padding_mode, align_corners)
        y = _compute_coords(y, H, padding_mode, align_corners)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        wx0 = 1.0 - wx1
        wy0 = 1.0 - wy1
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        ix1 = ix0 + 1
        iy1 = iy0 + 1
        v00 = _gather_2d(inp_flat, ix0, iy0, H, W)
        v01 = _gather_2d(inp_flat, ix1, iy0, H, W)
        v10 = _gather_2d(inp_flat, ix0, iy1, H, W)
        v11 = _gather_2d(inp_flat, ix1, iy1, H, W)
        bd = blend_dtype
        out = (
            v00 * (wx0 * wy0).astype(bd)[:, None]
            + v01 * (wx1 * wy0).astype(bd)[:, None]
            + v10 * (wx0 * wy1).astype(bd)[:, None]
            + v11 * (wx1 * wy1).astype(bd)[:, None]
        )
        return out.astype(out_dtype)

    # bicubic: padding applied per integer tap (torch get_value_bounded).
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    wxs = _cubic_weights(tx)
    wys = _cubic_weights(ty)

    def tap_coord(base: jax.Array, off: int, size: int) -> jax.Array:
        c = base + (off - 1)
        if padding_mode == "zeros":
            return c.astype(jnp.int32)
        c = _compute_coords(c, size, padding_mode, align_corners)
        return jnp.round(c).astype(jnp.int32)

    out = jnp.zeros((N, C) + x.shape[1:], cdtype)
    for j in range(4):
        iy = tap_coord(y0, j, H)
        row = jnp.zeros_like(out)
        for i in range(4):
            ix = tap_coord(x0, i, W)
            row = row + _gather_2d(inp_flat, ix, iy, H, W) * wxs[i][:, None]
        out = out + row * wys[j][:, None]
    return out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("mode", "padding_mode", "align_corners"))
def grid_sample_3d(
    inp: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jax.Array:
    """3D (volumetric) grid sample, torch-exact.

    Args:
      inp:  [N, C, D, H, W]
      grid: [N, Dout, Hout, Wout, 3], values in [-1, 1] (x, y, z order).
    Returns:
      [N, C, Dout, Hout, Wout]
    """
    assert mode in ("bilinear", "nearest") and padding_mode in PADDINGS
    N, C, D, H, W = inp.shape
    out_dtype = inp.dtype
    cdtype = jnp.float32
    grid = grid.astype(cdtype)
    # bf16 data stays bf16 through the gathers/blend (see grid_sample_2d)
    blend_dtype = jnp.bfloat16 if inp.dtype == jnp.bfloat16 else cdtype
    inp_flat = inp.reshape(N, C, D * H * W).astype(blend_dtype)

    x = _compute_coords(_unnormalize(grid[..., 0], W, align_corners), W, padding_mode, align_corners)
    y = _compute_coords(_unnormalize(grid[..., 1], H, align_corners), H, padding_mode, align_corners)
    z = _compute_coords(_unnormalize(grid[..., 2], D, align_corners), D, padding_mode, align_corners)

    if mode == "nearest":
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        iz = jnp.round(z).astype(jnp.int32)
        return _gather_3d(inp_flat, ix, iy, iz, D, H, W).astype(out_dtype)

    x0f, y0f, z0f = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    wx1, wy1, wz1 = x - x0f, y - y0f, z - z0f
    wx0, wy0, wz0 = 1.0 - wx1, 1.0 - wy1, 1.0 - wz1
    ix0, iy0, iz0 = x0f.astype(jnp.int32), y0f.astype(jnp.int32), z0f.astype(jnp.int32)
    ix1, iy1, iz1 = ix0 + 1, iy0 + 1, iz0 + 1

    out = jnp.zeros((N, C) + x.shape[1:], blend_dtype)
    for (iz, wz) in ((iz0, wz0), (iz1, wz1)):
        for (iy, wy) in ((iy0, wy0), (iy1, wy1)):
            for (ix, wx) in ((ix0, wx0), (ix1, wx1)):
                out = out + _gather_3d(inp_flat, ix, iy, iz, D, H, W) * (
                    wx * wy * wz
                ).astype(blend_dtype)[:, None]
    return out.astype(out_dtype)


def grid_sampler(
    inp: jax.Array,
    grid: jax.Array,
    interpolation_mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jax.Array:
    """Channel-first convenience wrapper matching the reference's public API
    (det2trt/models/functions/grid_sampler.py:144) — grid is channel-first
    [N, 2, Hout, Wout] (or [N, 3, D, H, W]) and is permuted internally.
    Grid values are in [-1, 1] (no x10 pre-scaling; see module docstring).
    """
    if grid.ndim == 4:
        return grid_sample_2d(
            inp, jnp.moveaxis(grid, 1, -1), interpolation_mode, padding_mode, align_corners
        )
    if grid.ndim == 5:
        return grid_sample_3d(
            inp, jnp.moveaxis(grid, 1, -1), interpolation_mode, padding_mode, align_corners
        )
    raise ValueError(f"grid must be 4D or 5D, got {grid.ndim}D")
