"""2D detection training criteria: YOLOX (SimOTA) and CenterNet.

TPU-native, fully-jittable (static shapes, masked padding) equivalents of
the criteria the reference's 2D QAT fine-tune drives through mmdet
(tools/2d/train.py + configs/yolox/yolox_x_8x8_300e_coco_trt_q.py,
configs/centernet/centernet_resnet18_dcnv2_140e_coco_trt_q.py):

  * YOLOX: mmdet SimOTAAssigner (center-prior candidates, cls+3*iou cost,
    dynamic-k by top-10 IoU mass) + IoU loss (squared mode, w=5), BCE cls
    with IoU-soft targets, BCE objectness
    [mmdet/models/dense_heads/yolox_head.py loss_by_feat,
     mmdet/models/task_modules/assigners/sim_ota_assigner.py]
  * CenterNet: gaussian focal heatmap (alpha 2, gamma 4, min_overlap 0.3
    radius) + masked L1 on wh (w=0.1) and center offset (w=1.0)
    [mmdet/models/dense_heads/centernet_head.py loss_by_feat]

GT convention: per image `gt_boxes` [max_gt, 4] xyxy input-image pixels and
`gt_labels` [max_gt] int32 with -1 padding.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

INF = 1e8


def _pairwise_iou(boxes1, boxes2):
    """[P, 4] x [G, 4] xyxy -> [P, G]."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = jnp.clip(boxes1[:, 2] - boxes1[:, 0], 0.0) * jnp.clip(
        boxes1[:, 3] - boxes1[:, 1], 0.0
    )
    a2 = jnp.clip(boxes2[:, 2] - boxes2[:, 0], 0.0) * jnp.clip(
        boxes2[:, 3] - boxes2[:, 1], 0.0
    )
    return inter / jnp.maximum(a1[:, None] + a2[None, :] - inter, 1e-9)


def _bce_logits(logits, targets):
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def _flatten_yolox(outs: Sequence[Dict[str, jax.Array]], strides, img_idx: int):
    """Per-level head maps -> flat per-prior tensors for one image."""
    cls_l, reg_l, obj_l, centers_l, stride_l = [], [], [], [], []
    for o, s in zip(outs, strides):
        _, h, w, C = o["cls"].shape
        gx, gy = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
        centers = (jnp.stack([gx, gy], -1).reshape(-1, 2) + 0.5) * s
        cls_l.append(o["cls"][img_idx].reshape(-1, C))
        reg_l.append(o["reg"][img_idx].reshape(-1, 4))
        obj_l.append(o["obj"][img_idx].reshape(-1))
        centers_l.append(centers.astype(jnp.float32))
        stride_l.append(jnp.full((h * w,), s, jnp.float32))
    return (
        jnp.concatenate(cls_l),
        jnp.concatenate(reg_l),
        jnp.concatenate(obj_l),
        jnp.concatenate(centers_l),
        jnp.concatenate(stride_l),
    )


def _decode_boxes(reg, centers, stride):
    """mmdet YOLOXHead._bbox_decode: xy=(pred+grid)*stride, wh=exp(pred)*s."""
    xy = centers - 0.5 * stride[:, None] + reg[:, :2] * stride[:, None]
    # grid origin = centers - 0.5*stride; (pred + grid)*stride == origin + pred*stride
    wh = jnp.exp(jnp.clip(reg[:, 2:], -20.0, 8.0)) * stride[:, None]
    return jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)


def yolox_loss_single(
    outs: Sequence[Dict[str, jax.Array]],
    gt_boxes: jax.Array,   # [G, 4] xyxy
    gt_labels: jax.Array,  # [G] -1 pad
    num_classes: int,
    strides: Tuple[int, ...] = (8, 16, 32),
    candidate_topk: int = 10,
    center_radius: float = 2.5,
    img_idx: int = 0,
) -> Dict[str, jax.Array]:
    """SimOTA assignment + YOLOX losses for one image (static shapes)."""
    cls, reg, obj, centers, stride = _flatten_yolox(outs, strides, img_idx)
    P = cls.shape[0]
    G = gt_labels.shape[0]
    valid_gt = gt_labels >= 0  # [G]

    boxes = _decode_boxes(reg, centers, stride)  # [P, 4]
    iou = _pairwise_iou(boxes, gt_boxes)  # [P, G]

    # candidate priors: center inside gt box, or inside 2.5*stride center box
    cx, cy = centers[:, 0:1], centers[:, 1:2]
    in_gt = (
        (cx >= gt_boxes[:, 0][None])
        & (cx <= gt_boxes[:, 2][None])
        & (cy >= gt_boxes[:, 1][None])
        & (cy <= gt_boxes[:, 3][None])
    )  # [P, G]
    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    r = center_radius * stride[:, None]
    in_center = (
        (cx >= gcx[None] - r)
        & (cx <= gcx[None] + r)
        & (cy >= gcy[None] - r)
        & (cy <= gcy[None] + r)
    )
    cand = (in_gt | in_center) & valid_gt[None, :]
    strong = in_gt & in_center

    # SimOTA cost
    score = jax.nn.sigmoid(cls) * jax.nn.sigmoid(obj)[:, None]  # [P, C]
    onehot = jax.nn.one_hot(jnp.clip(gt_labels, 0), num_classes)  # [G, C]
    sq = jnp.sqrt(jnp.clip(score, 1e-9, 1.0))
    # BCE(sqrt(score), onehot) summed over classes, per (prior, gt)
    cls_cost = -(
        onehot[None] * jnp.log(sq[:, None])
        + (1 - onehot[None]) * jnp.log1p(-jnp.clip(sq[:, None], 0, 1 - 1e-9))
    ).sum(-1)  # [P, G]
    iou_cost = -jnp.log(iou + 1e-8)
    cost = cls_cost + 3.0 * iou_cost + INF * (~strong)
    cost = jnp.where(cand, cost, INF * 2)

    # dynamic k per gt: sum of top-10 candidate IoUs, floor 1
    iou_cand = jnp.where(cand, iou, 0.0)
    topk_iou = jax.lax.top_k(iou_cand.T, min(candidate_topk, P))[0]  # [G, k]
    dyn_k = jnp.clip(topk_iou.sum(-1).astype(jnp.int32), 1, None)  # [G]

    # per gt: priors whose cost-rank < dyn_k
    order = jnp.argsort(cost, axis=0)  # [P, G] prior ids by ascending cost
    rank = jnp.zeros((P, G), jnp.int32)
    rank = rank.at[order, jnp.arange(G)[None, :]].set(
        jnp.broadcast_to(jnp.arange(P)[:, None], (P, G))
    )
    matched = (rank < dyn_k[None, :]) & cand  # [P, G]

    # conflicts: prior kept only for its min-cost gt
    best_gt = jnp.argmin(jnp.where(matched, cost, INF * 4), axis=1)  # [P]
    keep = matched[jnp.arange(P), best_gt] & valid_gt[best_gt]
    fg = keep  # [P] foreground priors
    num_pos = jnp.maximum(fg.sum(), 1).astype(jnp.float32)

    matched_iou = iou[jnp.arange(P), best_gt]
    cls_target = (
        jax.nn.one_hot(jnp.clip(gt_labels[best_gt], 0), num_classes)
        * matched_iou[:, None]
    )
    loss_cls = (_bce_logits(cls, cls_target).sum(-1) * fg).sum() / num_pos
    loss_obj = _bce_logits(obj, fg.astype(obj.dtype)).sum() / num_pos
    # IoU loss, squared mode (mmdet IoULoss(mode='square'), weight 5)
    loss_box = (5.0 * (1.0 - matched_iou**2) * fg).sum() / num_pos
    return {
        "loss_cls": loss_cls,
        "loss_obj": loss_obj,
        "loss_bbox": loss_box,
        "loss": loss_cls + loss_obj + loss_box,
        "num_pos": num_pos,
    }


# ---------------------------------------------------------------------------
# CenterNet
# ---------------------------------------------------------------------------
def _gaussian_radius(h, w, min_overlap=0.3):
    """mmdet gaussian_radius (three quadratic cases, min)."""
    a1 = 1
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.clip(b1**2 - 4 * a1 * c1, 0.0))
    r1 = (b1 - sq1) / (2 * a1)
    a2 = 4
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = jnp.sqrt(jnp.clip(b2**2 - 4 * a2 * c2, 0.0))
    r2 = (b2 - sq2) / (2 * a2)
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    sq3 = jnp.sqrt(jnp.clip(b3**2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def centernet_targets(
    gt_boxes: jax.Array,   # [G, 4] xyxy input pixels
    gt_labels: jax.Array,  # [G] -1 pad
    num_classes: int,
    feat_h: int,
    feat_w: int,
    stride: int = 4,
):
    """Heatmap/wh/offset targets (mmdet CenterNetHead.get_targets)."""
    G = gt_labels.shape[0]
    valid = gt_labels >= 0
    ctr = jnp.stack(
        [(gt_boxes[:, 0] + gt_boxes[:, 2]) / 2, (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2],
        -1,
    ) / stride
    ctr_int = jnp.floor(ctr).astype(jnp.int32)
    w = (gt_boxes[:, 2] - gt_boxes[:, 0]) / stride
    h = (gt_boxes[:, 3] - gt_boxes[:, 1]) / stride
    radius = jnp.clip(_gaussian_radius(h, w), 0.0)
    sigma = (2 * radius + 1) / 6.0

    gx = jnp.arange(feat_w, dtype=jnp.float32)
    gy = jnp.arange(feat_h, dtype=jnp.float32)
    # per gt gaussian [G, H, W]
    dx2 = (gx[None, None, :] - ctr_int[:, 0, None, None]) ** 2
    dy2 = (gy[None, :, None] - ctr_int[:, 1, None, None]) ** 2
    g = jnp.exp(-(dx2 + dy2) / jnp.clip(2 * sigma[:, None, None] ** 2, 1e-6))
    # mmdet gen_gaussian_target truncates outside the radius box
    inside = (jnp.sqrt(dx2) <= radius[:, None, None] + 0.5) & (
        jnp.sqrt(dy2) <= radius[:, None, None] + 0.5
    )
    g = g * inside * valid[:, None, None]
    onehot = jax.nn.one_hot(jnp.clip(gt_labels, 0), num_classes)  # [G, C]
    heat = jnp.max(g[:, None] * onehot[:, :, None, None], axis=0)  # [C, H, W]

    in_bounds = (
        valid
        & (ctr_int[:, 0] >= 0)
        & (ctr_int[:, 0] < feat_w)
        & (ctr_int[:, 1] >= 0)
        & (ctr_int[:, 1] < feat_h)
    )
    return heat.transpose(1, 2, 0), ctr, ctr_int, w, h, in_bounds


def centernet_loss_single(
    heads: Dict[str, jax.Array],  # NHWC maps
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    num_classes: int,
    stride: int = 4,
    img_idx: int = 0,
) -> Dict[str, jax.Array]:
    hm_pred = heads["heatmap"][img_idx]  # [H, W, C] logits
    wh_pred = heads["wh"][img_idx]
    off_pred = heads["offset"][img_idx]
    H, W = hm_pred.shape[:2]
    heat, ctr, ctr_int, bw, bh, ok = centernet_targets(
        gt_boxes, gt_labels, num_classes, H, W, stride
    )
    p = jax.nn.sigmoid(hm_pred)
    eps = 1e-6
    pos = (heat >= 1.0 - 1e-6).astype(p.dtype)
    # gaussian focal (alpha=2, gamma=4)
    loss_pos = -((1 - p) ** 2) * jnp.log(p + eps) * pos
    loss_neg = -((1 - heat) ** 4) * (p**2) * jnp.log(1 - p + eps) * (1 - pos)
    num_pos = jnp.maximum(pos.sum(), 1.0)
    loss_heat = (loss_pos + loss_neg).sum() / num_pos

    # wh / offset L1 at center pixels
    idx = jnp.clip(ctr_int, 0, jnp.asarray([W - 1, H - 1]))
    wh_at = wh_pred[idx[:, 1], idx[:, 0]]      # [G, 2]
    off_at = off_pred[idx[:, 1], idx[:, 0]]    # [G, 2]
    okf = ok.astype(jnp.float32)
    n = jnp.maximum(okf.sum(), 1.0)
    loss_wh = 0.1 * (
        jnp.abs(wh_at - jnp.stack([bw, bh], -1)) * okf[:, None]
    ).sum() / (2 * n)
    loss_off = (
        jnp.abs(off_at - (ctr - ctr_int)) * okf[:, None]
    ).sum() / (2 * n)
    return {
        "loss_heatmap": loss_heat,
        "loss_wh": loss_wh,
        "loss_offset": loss_off,
        "loss": loss_heat + loss_wh + loss_off,
        "num_pos": okf.sum(),
    }
