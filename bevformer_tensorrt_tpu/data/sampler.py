"""Data sharding samplers for multi-host eval/training.

TPU-native equivalents of the reference's samplers
(third_party/bev_mmdet3d/datasets/samplers/distributed_sampler.py:8-36
even-split DistributedSampler and group sampler): with JAX there is one
process per host, so a sampler is just an index partition.
"""
from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np


def even_split_indices(n: int, shard: int, num_shards: int) -> np.ndarray:
    """Even split with round-robin padding — every shard gets ceil(n/shards)
    indices (the reference pads so all ranks step together,
    distributed_sampler.py:30-36)."""
    per = -(-n // num_shards)
    idx = np.arange(per * num_shards) % n
    return idx[shard::num_shards][:per]


def scene_group_shards(scene_tokens: Sequence[str], num_shards: int) -> List[List[int]]:
    """Scene-grouped sharding for recurrent eval: all frames of one scene go
    to the same shard (prev_bev recurrence can't cross hosts).  Greedy
    balance by scene length."""
    groups: dict = {}
    for i, tok in enumerate(scene_tokens):
        groups.setdefault(tok, []).append(i)
    shards: List[List[int]] = [[] for _ in range(num_shards)]
    for frames in sorted(groups.values(), key=len, reverse=True):
        min(shards, key=len).extend(frames)
    return shards


class ShuffledBatchSampler:
    """Epoch-shuffled batch index iterator (training; host-local shard)."""

    def __init__(self, n: int, batch: int, shard: int = 0, num_shards: int = 1, seed: int = 0):
        self.n, self.batch = n, batch
        self.shard, self.num_shards = shard, num_shards
        self.rng = np.random.default_rng(seed + shard)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            idx = even_split_indices(self.n, self.shard, self.num_shards)
            self.rng.shuffle(idx)
            for s in range(0, len(idx) - self.batch + 1, self.batch):
                yield idx[s : s + self.batch]
