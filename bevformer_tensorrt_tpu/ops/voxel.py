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


@functools.partial(jax.jit, static_argnames=("out_size", "mode"))
def roiaware_pool3d(
    rois: jax.Array,          # [B, 7] (x, y, z bottom-center, dx, dy, dz, yaw)
    points: jax.Array,        # [P, 3]
    feats: jax.Array,         # [P, C]
    out_size: Tuple[int, int, int] = (4, 4, 4),
    mode: str = "max",
) -> jax.Array:
    """RoI-aware 3D pooling: voxelize each rotated roi into an out_size grid
    and max/avg-pool the features of the points inside each cell.

    TPU-native scatter formulation of the reference's per-voxel CUDA kernel
    (third_party/bev_mmdet3d/ops/roiaware_pool3d/roiaware_pool3d.py:25-40,
    src/roiaware_pool3d_kernel.cu): points are mapped to roi-local cells
    with one rotation + floor, then a vmapped scatter-max (or sum/count)
    over rois produces [B, nx, ny, nz, C].  Empty cells are 0, matching the
    reference's zero-initialized output.  Static shapes; jit/vmap friendly.
    """
    nx, ny, nz = out_size
    ncell = nx * ny * nz
    B = rois.shape[0]
    C = feats.shape[-1]
    f32 = jnp.float32

    d = points[None, :, :2] - rois[:, None, :2]       # [B, P, 2]
    c = jnp.cos(-rois[:, None, 6])
    s = jnp.sin(-rois[:, None, 6])
    lx = d[..., 0] * c - d[..., 1] * s + rois[:, None, 3] / 2
    ly = d[..., 0] * s + d[..., 1] * c + rois[:, None, 4] / 2
    lz = points[None, :, 2] - rois[:, None, 2]        # bottom-center z
    cell = jnp.stack(
        [
            jnp.floor(lx / rois[:, None, 3] * nx),
            jnp.floor(ly / rois[:, None, 4] * ny),
            jnp.floor(lz / rois[:, None, 5] * nz),
        ],
        axis=-1,
    ).astype(jnp.int32)                               # [B, P, 3]
    inside = (
        (cell >= 0).all(-1)
        & (cell[..., 0] < nx) & (cell[..., 1] < ny) & (cell[..., 2] < nz)
        & jnp.isfinite(points).all(-1)[None]
    )
    idx = jnp.where(
        inside, (cell[..., 0] * ny + cell[..., 1]) * nz + cell[..., 2], ncell
    )  # out-of-box -> dropped slot

    def pool_one(idx_b, inside_b):
        if mode == "max":
            out = jnp.full((ncell + 1, C), -jnp.inf, f32).at[idx_b].max(
                jnp.where(inside_b[:, None], feats.astype(f32), -jnp.inf),
                mode="drop",
            )[:ncell]
            # only EMPTY cells are zero-filled; occupied cells keep their
            # true (possibly negative) max, as the reference kernel does
            return jnp.where(jnp.isfinite(out), out, 0.0)
        tot = jnp.zeros((ncell + 1, C), f32).at[idx_b].add(
            jnp.where(inside_b[:, None], feats.astype(f32), 0.0), mode="drop"
        )[:ncell]
        cnt = jnp.zeros((ncell + 1,), f32).at[idx_b].add(
            inside_b.astype(f32), mode="drop"
        )[:ncell]
        return tot / jnp.maximum(cnt, 1.0)[:, None]

    out = jax.vmap(pool_one)(idx, inside)  # [B, ncell, C]
    return out.reshape(B, nx, ny, nz, C).astype(feats.dtype)
