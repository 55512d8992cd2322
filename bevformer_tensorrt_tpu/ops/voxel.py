"""Voxelization and points-in-boxes utilities.

TPU-native equivalents of the reference's lidar-legacy torch CUDA
extensions (third_party/bev_mmdet3d/ops/voxel — hard voxelizer — and
ops/roiaware_pool3d points_in_boxes; SURVEY.md §2.2 T3/T4: vendored and
built but unused by the camera path).  Provided as jittable static-shape
ops so the eval utilities that depend on them work on TPU.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("max_voxels", "max_points_per_voxel", "grid_size")
)
def voxelize(
    points: jax.Array,          # [N, F>=3] (x, y, z, ...), padded with nan
    point_range: Tuple[float, ...],   # (x0, y0, z0, x1, y1, z1)
    voxel_size: Tuple[float, float, float],
    grid_size: Tuple[int, int, int],  # (gx, gy, gz) — static
    max_voxels: int = 16000,
    max_points_per_voxel: int = 32,
):
    """Hard voxelization with static output shapes.

    Returns (voxels [V, P, F], coords [V, 3] (zyx), num_points [V],
    valid [V] bool).  Deterministic: first-come ordering by point index.
    """
    N, F = points.shape
    lower = jnp.asarray(point_range[:3], jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    gx, gy, gz = grid_size

    xyz = points[:, :3]
    finite = jnp.isfinite(xyz).all(-1)
    c = jnp.floor((xyz - lower) / vs).astype(jnp.int32)
    inb = (
        finite
        & (c[:, 0] >= 0) & (c[:, 0] < gx)
        & (c[:, 1] >= 0) & (c[:, 1] < gy)
        & (c[:, 2] >= 0) & (c[:, 2] < gz)
    )
    flat = jnp.where(inb, (c[:, 2] * gy + c[:, 1]) * gx + c[:, 0], gx * gy * gz)

    # assign voxel slots: unique flat ids via sort
    order = jnp.argsort(flat, stable=True)
    sf = flat[order]
    first = jnp.concatenate([jnp.ones(1, bool), sf[1:] != sf[:-1]])
    first = first & (sf < gx * gy * gz)
    voxel_rank = jnp.cumsum(first) - 1          # per sorted point: voxel index
    in_voxel_rank = jnp.arange(N) - jnp.maximum(
        jnp.maximum.accumulate(jnp.where(first, jnp.arange(N), -1)), 0
    )
    keep = (voxel_rank < max_voxels) & (in_voxel_rank < max_points_per_voxel) & (sf < gx * gy * gz)

    voxels = jnp.zeros((max_voxels, max_points_per_voxel, F), points.dtype)
    vr = jnp.where(keep, voxel_rank, max_voxels)
    pr = jnp.where(keep, in_voxel_rank, 0)
    voxels = voxels.at[vr, pr].set(points[order], mode="drop")

    coords = jnp.full((max_voxels, 3), -1, jnp.int32)
    vflat = jnp.where(first & (voxel_rank < max_voxels), sf, 0)
    cz = vflat // (gx * gy)
    cy = (vflat // gx) % gy
    cx = vflat % gx
    czyx = jnp.stack([cz, cy, cx], -1).astype(jnp.int32)
    coords = coords.at[jnp.where(first, voxel_rank, max_voxels)].set(czyx, mode="drop")

    num_points = jnp.zeros(max_voxels, jnp.int32).at[vr].add(
        keep.astype(jnp.int32), mode="drop"
    )
    valid = num_points > 0
    return voxels, coords, num_points, valid


@jax.jit
def points_in_rotated_boxes(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """[N, 3] points x [B, 7] boxes (cx, cy, cz, w, l, h, yaw) -> [N, B] bool
    (roiaware_pool3d points_in_boxes equivalent; gravity-center z)."""
    p = points[:, None, :]  # [N, 1, 3]
    b = boxes[None]         # [1, B, 7]
    d = p[..., :2] - b[..., :2]
    c, s = jnp.cos(-b[..., 6]), jnp.sin(-b[..., 6])
    lx = d[..., 0] * c - d[..., 1] * s
    ly = d[..., 0] * s + d[..., 1] * c
    in_xy = (jnp.abs(lx) <= b[..., 3] / 2) & (jnp.abs(ly) <= b[..., 4] / 2)
    in_z = jnp.abs(p[..., 2] - b[..., 2]) <= b[..., 5] / 2
    return in_xy & in_z
