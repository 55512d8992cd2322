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
