"""Rotate a [C, H, W] feature map about a center point.

TPU-native equivalent of the reference's RotateTRT plugin
(TensorRT/plugin/rotate/rotateKernel.cu, python contract at
det2trt/models/functions/rotate.py:12-80).  Used by BEVFormer's temporal
alignment: the previous frame's BEV features are rotated by the ego-yaw
delta before temporal self-attention (det2trt/models/modules/transformer.py:121-131).

Angle and center are traced tensors (not static attrs), exactly like the
plugin, so one compiled graph serves every frame.  The rotation is an affine
grid + bilinear/nearest resample with zeros padding, align_corners=False —
torchvision.transforms.functional.rotate semantics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .grid_sample import grid_sample_2d


@functools.partial(jax.jit, static_argnames=("interpolation",))
def rotate(
    img: jax.Array,
    angle: jax.Array,
    center: jax.Array,
    interpolation: str = "nearest",
) -> jax.Array:
    """Rotate `img` by `angle` degrees counter-clockwise about `center`.

    Args:
      img: [C, H, W].
      angle: scalar tensor, degrees, counter-clockwise.
      center: [2] tensor (x, y) in pixels.
      interpolation: 'bilinear' | 'nearest'.

    Returns:
      [C, H, W] rotated image (zeros outside).
    """
    C, H, W = img.shape
    cdtype = jnp.float32
    angle = jnp.asarray(angle, cdtype).reshape(())
    center = jnp.asarray(center, cdtype).reshape(2)

    # Inverse-mapping affine matrix (torchvision semantics).
    cx = center[0] - 0.5 * W
    cy = center[1] - 0.5 * H
    a = -angle * (jnp.pi / 180.0)
    cos, sin = jnp.cos(a), jnp.sin(a)
    # theta = [[cos, sin, -cx*cos - cy*sin + cx], [-sin, cos, cx*sin - cy*cos + cy]]
    t02 = -cx * cos - cy * sin + cx
    t12 = cx * sin - cy * cos + cy

    d = 0.5
    xs = jnp.linspace(-0.5 * W + d, 0.5 * W + d - 1.0, W, dtype=cdtype)
    ys = jnp.linspace(-0.5 * H + d, 0.5 * H + d - 1.0, H, dtype=cdtype)
    base_x = jnp.broadcast_to(xs[None, :], (H, W))
    base_y = jnp.broadcast_to(ys[:, None], (H, W))

    # rescaled theta: grid coords normalized to [-1, 1] by (W, H)/2.
    gx = (base_x * cos + base_y * sin + t02) * (2.0 / W)
    gy = (base_x * -sin + base_y * cos + t12) * (2.0 / H)
    grid = jnp.stack([gx, gy], axis=-1)[None]  # [1, H, W, 2]

    out = grid_sample_2d(
        img[None].astype(cdtype), grid, mode=interpolation, padding_mode="zeros", align_corners=False
    )
    return out[0].astype(img.dtype)
