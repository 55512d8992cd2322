"""YOLOX decoupled head + decode, NHWC flax.

Equivalent of mmdet's YOLOXHead as deployed by the reference
(det2trt/models/detector/yolox.py YOLOXTRT forward_trt :41-80 emits 9 flat
per-level outputs cls/reg/obj; the QAT variant YOLOXHeadQ quantizes the
predictor convs, det2trt/models/dense_heads/yolox_head.py:39-47).  Decode:
grid + stride unmapping, sigmoid obj*cls scores, class-aware NMS on host.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..backbones.csp_darknet import ConvModule
from ..layers import QConv


class YOLOXHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 320
    stacked_convs: int = 2
    strides: Tuple[int, ...] = (8, 16, 32)
    quant: bool = False

    @nn.compact
    def __call__(self, feats: List[jax.Array]) -> List[Dict[str, jax.Array]]:
        outs = []
        for lvl, x in enumerate(feats):
            cls_feat = x
            reg_feat = x
            for i in range(self.stacked_convs):
                cls_feat = ConvModule(
                    self.feat_channels, 3, quant=self.quant, name=f"l{lvl}_cls{i}"
                )(cls_feat)
                reg_feat = ConvModule(
                    self.feat_channels, 3, quant=self.quant, name=f"l{lvl}_reg{i}"
                )(reg_feat)
            cls = QConv(self.num_classes, (1, 1), padding=0, quant=self.quant, name=f"l{lvl}_cls_out")(cls_feat)
            reg = QConv(4, (1, 1), padding=0, quant=self.quant, name=f"l{lvl}_reg_out")(reg_feat)
            obj = QConv(1, (1, 1), padding=0, quant=self.quant, name=f"l{lvl}_obj_out")(reg_feat)
            outs.append({"cls": cls, "reg": reg, "obj": obj})
        return outs


def yolox_decode(
    outs: Sequence[Dict[str, jax.Array]],
    strides: Sequence[int] = (8, 16, 32),
):
    """Per-image decode to (boxes xyxy [P, 4], scores [P, C]) — mmdet
    YOLOXHead._bbox_decode semantics: xy = (pred[:2] + grid) * stride,
    wh = exp(pred[2:4]) * stride."""
    boxes_all, scores_all = [], []
    for o, s in zip(outs, strides):
        n, h, w, C = o["cls"].shape
        gx = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, w, 1)
        gy = jnp.arange(h, dtype=jnp.float32).reshape(1, h, 1, 1)
        reg = o["reg"].astype(jnp.float32)
        cx = (reg[..., 0:1] + gx) * s
        cy = (reg[..., 1:2] + gy) * s
        bw = jnp.exp(reg[..., 2:3]) * s
        bh = jnp.exp(reg[..., 3:4]) * s
        boxes = jnp.concatenate(
            [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1
        ).reshape(n, h * w, 4)
        score = jax.nn.sigmoid(o["cls"].astype(jnp.float32)) * jax.nn.sigmoid(
            o["obj"].astype(jnp.float32)
        )
        scores_all.append(score.reshape(n, h * w, C))
        boxes_all.append(boxes)
    return jnp.concatenate(boxes_all, axis=1), jnp.concatenate(scores_all, axis=1)


def yolox_post_process(
    boxes: np.ndarray,   # [P, 4]
    scores: np.ndarray,  # [P, C]
    score_thr: float = 0.01,
    iou_threshold: float = 0.65,
    max_per_img: int = 100,
):
    """Host-side class-aware NMS (mmdet multiclass_nms semantics)."""
    from ...core.nms2d import multiclass_nms

    return multiclass_nms(
        np.asarray(boxes), np.asarray(scores), score_thr, iou_threshold, max_per_img
    )
