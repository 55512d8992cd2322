"""DETR-style 3D detection losses and match costs (jnp, fully jittable).

TPU-native equivalents of the reference's training criterion
(third_party/bev_mmdet3d/core/bbox/): `normalize_bbox` (util/normalize_bbox),
mmdet's sigmoid FocalLoss (gamma=2, alpha=0.25, weight 2.0) and L1Loss
(weight 0.25) as configured in configs/bevformer/bevformer_base.py, plus the
HungarianAssigner3D match costs FocalLossCost(2.0) / BBox3DL1Cost(0.25)
(core/bbox/match_costs in the reference; assigner in assigner.py).

Everything is batched + masked (no dynamic shapes): ground truth comes padded
to a static `max_gt` with label -1 marking padding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_bbox(gt_boxes: jax.Array) -> jax.Array:
    """LiDAR 9-dof boxes -> 10-dim regression code.

    Input  [..., 9]: (cx, cy, cz, w, l, h, rot, vx, vy), metric.
    Output [..., 10]: (cx, cy, log w, log l, cz, log h, sin rot, cos rot, vx, vy)
    — the order produced by the reference's normalize_bbox and consumed by
    BEVFormerHead's reg branch decode (det2trt/models/dense_heads/
    bevformer_head.py:157-187).
    """
    cx, cy, cz, w, l, h, rot, vx, vy = jnp.split(gt_boxes, 9, axis=-1)
    eps = 1e-5
    return jnp.concatenate(
        [
            cx,
            cy,
            jnp.log(jnp.maximum(w, eps)),
            jnp.log(jnp.maximum(l, eps)),
            cz,
            jnp.log(jnp.maximum(h, eps)),
            jnp.sin(rot),
            jnp.cos(rot),
            vx,
            vy,
        ],
        axis=-1,
    )


def denormalize_bbox(code: jax.Array) -> jax.Array:
    """Inverse of normalize_bbox: 10-dim code -> (cx, cy, cz, w, l, h, rot, vx, vy)."""
    cx, cy, lw, ll, cz, lh, s, c, vx, vy = jnp.split(code, 10, axis=-1)
    rot = jnp.arctan2(s, c)
    return jnp.concatenate(
        [cx, cy, cz, jnp.exp(lw), jnp.exp(ll), jnp.exp(lh), rot, vx, vy], axis=-1
    )


def sigmoid_focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    num_classes: int,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jax.Array:
    """Per-element focal loss, summed over classes.

    labels == num_classes means background (all-zero one-hot), matching
    mmdet's sigmoid FocalLoss used by the reference config
    (configs/bevformer/bevformer_base.py loss_cls).
    Returns [..., ] per-prediction loss (not yet normalized).
    """
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, onehot)
    p_t = p * onehot + (1.0 - p) * (1.0 - onehot)
    alpha_t = alpha * onehot + (1.0 - alpha) * (1.0 - onehot)
    loss = alpha_t * jnp.power(1.0 - p_t, gamma) * ce
    return loss.sum(-1)


def optax_sigmoid_ce(logits, targets):
    """Numerically-stable binary cross-entropy from logits."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def focal_cls_cost(
    logits: jax.Array,
    gt_labels: jax.Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
    weight: float = 2.0,
    eps: float = 1e-12,
) -> jax.Array:
    """mmdet FocalLossCost: cost[q, g] for assigning query q to gt g.

    logits [nq, num_classes]; gt_labels [max_gt] (padding entries arbitrary —
    caller masks the resulting rows).
    """
    p = jax.nn.sigmoid(logits)
    neg = -jnp.log(1.0 - p + eps) * (1.0 - alpha) * jnp.power(p, gamma)
    pos = -jnp.log(p + eps) * alpha * jnp.power(1.0 - p, gamma)
    diff = pos - neg  # [nq, C]
    labels = jnp.clip(gt_labels, 0, logits.shape[-1] - 1)
    return diff[:, labels] * weight  # [nq, max_gt]


def bbox_l1_cost(pred: jax.Array, gt_norm: jax.Array, weight: float = 0.25) -> jax.Array:
    """BBox3DL1Cost over the first 8 code dims (the reference assigner slices
    [:, :8] — velocities excluded from matching)."""
    d = jnp.abs(pred[:, None, :8] - gt_norm[None, :, :8]).sum(-1)
    return d * weight


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Elementwise L1; caller applies weights/normalization."""
    return jnp.abs(pred - target)
