"""Auxiliary subsystem tests: samplers, voxelization, points-in-boxes."""
import numpy as np
import pytest
import jax.numpy as jnp

from bevformer_tensorrt_tpu.data.sampler import (
    ShuffledBatchSampler,
    even_split_indices,
    scene_group_shards,
)
from bevformer_tensorrt_tpu.ops.voxel import points_in_rotated_boxes, voxelize


class TestSamplers:
    def test_even_split_covers_all(self):
        n, shards = 103, 4
        seen = np.concatenate([even_split_indices(n, s, shards) for s in range(shards)])
        assert set(seen.tolist()) >= set(range(n))
        lens = {len(even_split_indices(n, s, shards)) for s in range(shards)}
        assert len(lens) == 1  # even

    def test_scene_groups_stay_together(self):
        tokens = ["a"] * 5 + ["b"] * 3 + ["c"] * 4 + ["d"] * 2
        shards = scene_group_shards(tokens, 2)
        for shard in shards:
            toks = {tokens[i] for i in shard}
            for t in toks:
                assert all(i in shard for i in range(len(tokens)) if tokens[i] == t)

    def test_batch_sampler_yields_batches(self):
        it = iter(ShuffledBatchSampler(50, 8, shard=0, num_shards=2))
        b = next(it)
        assert len(b) == 8


class TestVoxel:
    def test_voxelize_basic(self):
        pts = np.array(
            [[0.5, 0.5, 0.5, 1.0], [0.6, 0.6, 0.6, 2.0], [3.5, 3.5, 0.5, 3.0],
             [99.0, 0, 0, 4.0]],  # out of range
            np.float32,
        )
        voxels, coords, num_points, valid = voxelize(
            jnp.asarray(pts),
            point_range=(0, 0, 0, 4, 4, 1),
            voxel_size=(1.0, 1.0, 1.0),
            grid_size=(4, 4, 1),
            max_voxels=8,
            max_points_per_voxel=4,
        )
        v = np.asarray(valid)
        assert v.sum() == 2  # two occupied voxels
        np_counts = np.asarray(num_points)[v]
        assert sorted(np_counts.tolist()) == [1, 2]
        # the (0,0,0) voxel holds the two close points
        c = np.asarray(coords)[v]
        assert [0, 0, 0] in c.tolist()
        assert [0, 3, 3] in c.tolist()

    def test_points_in_rotated_boxes(self):
        pts = jnp.asarray([[0.0, 0.0, 0.0], [1.9, 0.0, 0.0], [0.0, 1.2, 0.0]])
        boxes = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, 0.0]])  # w=4 along x
        m = np.asarray(points_in_rotated_boxes(pts, boxes))[:, 0]
        assert m.tolist() == [True, True, False]
        # rotate the box 90deg: w now along y
        boxes_r = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, np.pi / 2]])
        m = np.asarray(points_in_rotated_boxes(pts, boxes_r))[:, 0]
        assert m.tolist() == [True, False, True]


class TestRoIAwarePool3d:
    """roiaware_pool3d vs a brute-force numpy oracle (reference contract:
    third_party/bev_mmdet3d/ops/roiaware_pool3d/roiaware_pool3d.py:25-40 —
    rois [B,7] bottom-center z, out [B, nx, ny, nz, C], empty cells 0)."""

    def _oracle(self, rois, pts, feats, out_size, mode):
        nx, ny, nz = out_size
        B, C = rois.shape[0], feats.shape[1]
        out = np.zeros((B, nx, ny, nz, C), np.float32)
        for b in range(B):
            x, y, z, dx, dy, dz, yaw = rois[b]
            d = pts[:, :2] - [x, y]
            c, s = np.cos(-yaw), np.sin(-yaw)
            lx = d[:, 0] * c - d[:, 1] * s + dx / 2
            ly = d[:, 0] * s + d[:, 1] * c + dy / 2
            lz = pts[:, 2] - z
            ci = np.floor(
                np.stack([lx / dx * nx, ly / dy * ny, lz / dz * nz], -1)
            ).astype(int)
            ok = (ci >= 0).all(-1) & (ci[:, 0] < nx) & (ci[:, 1] < ny) & (ci[:, 2] < nz)
            for i in np.where(ok)[0]:
                cx, cy, cz = ci[i]
                cell = out[b, cx, cy, cz]
                if mode == "max":
                    sel = getattr(self, f"_seen_{b}_{cx}_{cy}_{cz}", False)
                    out[b, cx, cy, cz] = feats[i] if not sel else np.maximum(cell, feats[i])
                    setattr(self, f"_seen_{b}_{cx}_{cy}_{cz}", True)
                else:
                    out[b, cx, cy, cz] = cell + feats[i]
            if mode == "avg":
                cnt = np.zeros((nx, ny, nz), np.float32)
                for i in np.where(ok)[0]:
                    cnt[tuple(ci[i])] += 1
                out[b] = out[b] / np.maximum(cnt, 1)[..., None]
        return out

    @pytest.mark.parametrize("mode", ["max", "avg"])
    def test_matches_oracle(self, mode):
        from bevformer_tensorrt_tpu.ops.voxel import roiaware_pool3d

        rng = np.random.default_rng(0)
        rois = np.stack(
            [
                rng.uniform(-5, 5, 3),
                rng.uniform(2, 4, 3),
                rng.uniform(-np.pi, np.pi, 3),
            ],
            axis=0,
        ).T.reshape(3, 3)
        rois = np.concatenate(
            [rois[:, :1], rois[:, :1] * 0.5, rois[:, :1] * 0.1,
             rng.uniform(2, 4, (3, 3)), rng.uniform(-np.pi, np.pi, (3, 1))],
            axis=1,
        ).astype(np.float32)  # [3, 7]
        pts = rng.uniform(-6, 6, (500, 3)).astype(np.float32)
        feats = rng.standard_normal((500, 8)).astype(np.float32)
        got = np.asarray(
            roiaware_pool3d(rois, pts, feats, out_size=(4, 3, 2), mode=mode)
        )
        want = self._oracle(rois, pts, feats, (4, 3, 2), mode)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
