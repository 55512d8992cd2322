"""NMS-free box decoding for BEVFormer outputs.

TPU-native equivalent of the reference's NMSFreeCoder
(third_party/bev_mmdet3d/core/bbox/coders/nms_free_coder.py:9-128) and
denormalize_bbox (core/bbox/util.py:26-53): per-frame top-k over
query x class sigmoid scores, box denormalization (exp sizes, atan2 yaw),
post-center-range filter.  Decoding is jit-compiled with a static top-k and
returns a validity mask instead of a ragged filter (TPU-friendly static
shapes); the host converts to ragged results.

Gravity-center convention: the reference wraps decoded boxes in
LiDARInstance3DBoxes(origin=(0.5,0.5,0.5)) then evaluates on gravity
centers; the z here is the box center (see data/nuscenes.py for the
eval-side handling).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def denormalize_bbox(normalized: jnp.ndarray) -> jnp.ndarray:
    """[..., 10] (cx, cy, w, l, cz, h, rot_sin, rot_cos, vx, vy) ->
    [..., 9] (cx, cy, cz, w, l, h, yaw, vx, vy)."""
    rot = jnp.arctan2(normalized[..., 6:7], normalized[..., 7:8])
    cx = normalized[..., 0:1]
    cy = normalized[..., 1:2]
    cz = normalized[..., 4:5]
    w = jnp.exp(normalized[..., 2:3])
    l = jnp.exp(normalized[..., 3:4])
    h = jnp.exp(normalized[..., 5:6])
    vel = normalized[..., 8:10]
    return jnp.concatenate([cx, cy, cz, w, l, h, rot, vel], axis=-1)


@dataclasses.dataclass(frozen=True)
class NMSFreeCoder:
    post_center_range: Tuple[float, ...] = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    max_num: int = 300
    num_classes: int = 10
    score_threshold: float | None = None

    @functools.partial(jax.jit, static_argnames=("self",))
    def decode_single(self, cls_scores: jnp.ndarray, bbox_preds: jnp.ndarray):
        """cls_scores [num_query, num_classes] logits; bbox_preds [num_query, 10].

        Returns (bboxes [K, 9], scores [K], labels [K], valid [K] bool),
        K = min(max_num, num_query * num_classes)."""
        scores = jax.nn.sigmoid(cls_scores.astype(jnp.float32)).reshape(-1)
        # small configs (micro CI) can have fewer proposals than max_num
        top_scores, idx = jax.lax.top_k(scores, min(self.max_num, scores.shape[0]))
        labels = idx % self.num_classes
        bbox_index = idx // self.num_classes
        boxes = denormalize_bbox(bbox_preds[bbox_index].astype(jnp.float32))

        rng = jnp.asarray(self.post_center_range, jnp.float32)
        valid = jnp.all(boxes[:, :3] >= rng[:3], axis=1) & jnp.all(
            boxes[:, :3] <= rng[3:], axis=1
        )
        if self.score_threshold is not None:
            valid = valid & (top_scores > self.score_threshold)
        return boxes, top_scores, labels, valid

    def decode(self, outputs_classes, outputs_coords):
        """Decode the last decoder level for every sample in the batch,
        returning host-side ragged results (list of dicts)."""
        cls = outputs_classes[-1]
        box = outputs_coords[-1]
        results = []
        for i in range(cls.shape[0]):
            boxes, scores, labels, valid = self.decode_single(cls[i], box[i])
            v = np.asarray(valid)
            results.append(
                {
                    "boxes_3d": np.asarray(boxes)[v],
                    "scores_3d": np.asarray(scores)[v],
                    "labels_3d": np.asarray(labels)[v],
                }
            )
        return results
