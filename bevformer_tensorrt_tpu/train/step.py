"""BEVFormer training step: DETR loss over decoder levels + optimizer.

TPU-native equivalent of the reference's train loop body
(third_party/bev_mmdet3d/models/dense_heads — BEVFormerHead.loss/loss_single,
Hungarian matching per decoder level, focal cls loss weight 2.0 + L1 bbox
loss weight 0.25; apis/mmdet_train.py wraps it in DDP).  Here the whole step
— forward, per-level matching, loss, grads, AdamW update — is one jittable
function designed to be `jax.jit`-ed with shardings over a
`jax.sharding.Mesh` (dp batch axis; tp via parallel/sharding.py rules).
Gradient reduction across dp is XLA's job (params replicated -> psum
inserted automatically by GSPMD).

GT convention (static shapes): per sample `gt_boxes` [max_gt, 9]
(cx, cy, cz, w, l, h, rot, vx, vy — metric) and `gt_labels` [max_gt] int32
with -1 padding.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .assigner import hungarian_assign
from .losses import (
    bbox_l1_cost,
    focal_cls_cost,
    l1_loss,
    normalize_bbox,
    sigmoid_focal_loss,
)


def _loss_single_level(
    cls_logits: jax.Array,   # [nq, num_classes]
    bbox_preds: jax.Array,   # [nq, 10] (decoded code space, metric xy/z)
    gt_code: jax.Array,      # [max_gt, 10] normalized gt code
    gt_labels: jax.Array,    # [max_gt] int32, -1 = padding
    num_classes: int,
    cls_weight: float = 2.0,
    bbox_weight: float = 0.25,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One decoder level: match, then focal + L1. Returns (cls, bbox, num_pos)."""
    nq = cls_logits.shape[0]
    max_gt = gt_labels.shape[0]
    valid = gt_labels >= 0  # [max_gt]

    c_cls = focal_cls_cost(cls_logits, gt_labels, weight=cls_weight)  # [nq, max_gt]
    c_reg = bbox_l1_cost(bbox_preds, gt_code, weight=bbox_weight)
    cost = (c_cls + c_reg).T  # [max_gt, nq]
    cost = jnp.where(valid[:, None], cost, 0.0)  # constant rows for padding
    row2col = hungarian_assign(cost)  # [max_gt]

    # scatter matched gts onto queries
    q_idx = jnp.where(valid, row2col, nq)  # padded rows -> overflow slot
    labels = jnp.full((nq + 1,), num_classes, jnp.int32)
    labels = labels.at[q_idx].set(jnp.where(valid, gt_labels, num_classes))[:nq]
    targets = jnp.zeros((nq + 1, gt_code.shape[-1]), gt_code.dtype)
    targets = targets.at[q_idx].set(jnp.where(valid[:, None], gt_code, 0.0))[:nq]
    pos_mask = jnp.zeros((nq + 1,), bool).at[q_idx].set(valid)[:nq]

    num_pos = valid.sum().astype(jnp.float32)
    cls_loss = sigmoid_focal_loss(cls_logits, labels, num_classes).sum() * cls_weight
    code_ok = jnp.isfinite(targets).all(-1) & pos_mask
    # reference code_weights [1.0]*8 + [0.2, 0.2] (bevformer_head.py:71,427):
    # velocity dims are down-weighted 5x in the regression loss.
    code_w = jnp.asarray([1.0] * 8 + [0.2] * 2, bbox_preds.dtype)
    bbox_loss = (
        (l1_loss(bbox_preds, targets) * code_w).sum(-1) * code_ok.astype(bbox_preds.dtype)
    ).sum() * bbox_weight
    return cls_loss, bbox_loss, num_pos


def bevformer_detr_loss(
    outputs_classes: jax.Array,  # [L, 1, nq, num_classes]
    outputs_coords: jax.Array,   # [L, 1, nq, 10]
    gt_boxes: jax.Array,         # [max_gt, 9]
    gt_labels: jax.Array,        # [max_gt]
    num_classes: int,
) -> Dict[str, jax.Array]:
    """Sum of per-level losses (reference loss() iterates all decoder levels).

    Returns unnormalized sums + num_pos; the caller divides by the (possibly
    dp-psum'd) positive count — the reference's sync_cls_avg_factor.
    """
    L = outputs_classes.shape[0]
    gt_code = normalize_bbox(gt_boxes)

    def level(lvl):
        return _loss_single_level(
            outputs_classes[lvl, 0],
            outputs_coords[lvl, 0],
            gt_code,
            gt_labels,
            num_classes,
        )

    cls_l, bbox_l, num_pos = jax.vmap(level)(jnp.arange(L))
    return {
        "cls_sum": cls_l.sum(),
        "bbox_sum": bbox_l.sum(),
        "num_pos": num_pos[0] * L,  # same gts each level
    }


def make_optimizer(
    learning_rate: float = 2e-4,
    weight_decay: float = 0.01,
    backbone_lr_mult: float = 0.1,
    total_steps: Optional[int] = None,
    warmup_steps: int = 500,
    grad_clip: float = 35.0,
) -> optax.GradientTransformation:
    """AdamW with cosine decay, linear warmup, grad-norm clip 35 and 0.1 lr
    mult on the image backbone — the reference's optimizer config
    (configs/bevformer/bevformer_base.py optimizer/lr_config, grad_clip
    max_norm=35)."""
    if total_steps is not None:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1),
            end_value=learning_rate * 1e-3,
        )
    else:
        sched = learning_rate

    def backbone_mask(params):
        return jax.tree.map_with_path(
            lambda path, _: any("img_backbone" in str(k) for k in path), params
        )

    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, weight_decay=weight_decay),
        optax.masked(optax.scale(backbone_lr_mult), backbone_mask),
    )


def make_train_step(
    model: Any,
    num_classes: int,
    tx: optax.GradientTransformation,
    quant_vars: Any = None,
) -> Callable:
    """Build the jittable train step.

    Batch dict (leading dim B = per-step global batch, sharded on dp):
      image      [B, cams, 3, H, W]
      can_bus    [B, 18]
      lidar2img  [B, 1, cams, 4, 4]
      gt_boxes   [B, max_gt, 9]
      gt_labels  [B, max_gt]
    Single-frame training (use_prev_bev=0) — the temporal queue variant adds
    a no-grad history pass (reference obtain_history_bev) later.

    quant_vars: calibrated scale collection for QAT — without it the QDQ
    sites are identity and "QAT" would silently train plain fp (the
    reference's TensorQuantizers carry calibrated amax the same way,
    samples/bevformer/base/quant_max_ptq.sh -> quant_aware_train.sh).
    """

    def per_sample(params, batch_stats, image, can_bus, lidar2img, gt_boxes, gt_labels):
        nq_bev = model.cfg.bev_h * model.cfg.bev_w
        prev_bev = jnp.zeros((nq_bev, 1, model.cfg.embed_dims), jnp.float32)
        variables = {"params": params, "batch_stats": batch_stats}
        if quant_vars is not None:
            variables["quant"] = quant_vars
        _, classes, coords = model.apply(
            variables,
            image[None],
            prev_bev,
            jnp.float32(0.0),
            can_bus,
            lidar2img,
        )
        return bevformer_detr_loss(classes, coords, gt_boxes, gt_labels, num_classes)

    def loss_fn(params, batch_stats, batch):
        out = jax.vmap(per_sample, in_axes=(None, None, 0, 0, 0, 0, 0))(
            params,
            batch_stats,
            batch["image"],
            batch["can_bus"],
            batch["lidar2img"],
            batch["gt_boxes"],
            batch["gt_labels"],
        )
        num_pos = jnp.maximum(out["num_pos"].sum(), 1.0)
        loss = (out["cls_sum"].sum() + out["bbox_sum"].sum()) / num_pos
        metrics = {
            "loss": loss,
            "loss_cls": out["cls_sum"].sum() / num_pos,
            "loss_bbox": out["bbox_sum"].sum() / num_pos,
            "num_pos": num_pos,
        }
        return loss, metrics

    def train_step(params, batch_stats, opt_state, batch):
        """batch_stats are frozen (reference norm_eval=True — BN never updates)."""
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


def make_temporal_train_step(
    model: Any,
    num_classes: int,
    tx: optax.GradientTransformation,
    queue_length: int = 4,
    quant_vars: Any = None,
) -> Callable:
    """Temporal-queue training step (reference BEVFormer.forward_train +
    obtain_history_bev, third_party/bev_mmdet3d/models/detectors/
    bevformer.py:168-192): the first queue_length-1 frames run WITHOUT
    gradients to build prev_bev; the last frame trains against it.

    Batch dict (B = global batch of clips, sharded on dp):
      image      [B, T, cams, 3, H, W]   (T = queue_length)
      can_bus    [B, T, 18]              (relative deltas, dataset-side)
      lidar2img  [B, T, 1, cams, 4, 4]
      gt_boxes   [B, max_gt, 9]          (last frame's GT)
      gt_labels  [B, max_gt]
    """
    T = queue_length

    def per_sample(params, batch_stats, image, can_bus, lidar2img, gt_boxes, gt_labels):
        cfg = model.cfg
        nq_bev = cfg.bev_h * cfg.bev_w
        variables = {"params": params, "batch_stats": batch_stats}
        if quant_vars is not None:
            variables["quant"] = quant_vars
        prev_bev = jnp.zeros((nq_bev, 1, cfg.embed_dims), jnp.float32)
        use_prev = jnp.float32(0.0)
        # history pass, no grad (static unroll: T-1 frames)
        for t in range(T - 1):
            bev, _, _ = model.apply(
                variables,
                jax.lax.stop_gradient(image[t][None]),
                jax.lax.stop_gradient(prev_bev),
                use_prev,
                can_bus[t],
                lidar2img[t],
            )
            prev_bev = jax.lax.stop_gradient(bev)
            use_prev = jnp.float32(1.0)
        _, classes, coords = model.apply(
            variables, image[T - 1][None], prev_bev, use_prev, can_bus[T - 1], lidar2img[T - 1]
        )
        return bevformer_detr_loss(classes, coords, gt_boxes, gt_labels, num_classes)

    def loss_fn(params, batch_stats, batch):
        out = jax.vmap(per_sample, in_axes=(None, None, 0, 0, 0, 0, 0))(
            params,
            batch_stats,
            batch["image"],
            batch["can_bus"],
            batch["lidar2img"],
            batch["gt_boxes"],
            batch["gt_labels"],
        )
        num_pos = jnp.maximum(out["num_pos"].sum(), 1.0)
        loss = (out["cls_sum"].sum() + out["bbox_sum"].sum()) / num_pos
        return loss, {
            "loss": loss,
            "loss_cls": out["cls_sum"].sum() / num_pos,
            "loss_bbox": out["bbox_sum"].sum() / num_pos,
            "num_pos": num_pos,
        }

    def train_step(params, batch_stats, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


def init_train_state(model, rng, cfg, tx):
    """Initialize params + opt state at the model's deploy shapes."""
    nq_bev = cfg.bev_h * cfg.bev_w
    image = jnp.zeros((1, cfg.num_cams, 3, cfg.img_h, cfg.img_w), jnp.float32)
    prev_bev = jnp.zeros((nq_bev, 1, cfg.embed_dims), jnp.float32)
    can_bus = jnp.zeros((cfg.can_bus_dims,), jnp.float32)
    lidar2img = jnp.zeros((1, cfg.num_cams, 4, 4), jnp.float32)
    variables = model.init(rng, image, prev_bev, jnp.float32(0.0), can_bus, lidar2img)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return params, batch_stats, opt_state
