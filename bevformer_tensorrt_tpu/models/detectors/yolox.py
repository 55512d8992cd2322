"""YOLOX detector (CSPDarknet + PAFPN + decoupled head).

TPU-native equivalent of det2trt/models/detector/yolox.py (YOLOXTRT
forward_trt :41-80 — 9 flat outputs, 3 levels x {cls, reg, obj}); decode +
class-aware NMS live in heads/yolox_head.py.  Batch-N capable (the
reference's 2D path evaluates TRT engines at batch 32,
configs/yolox/yolox_x_8x8_300e_coco_trt.py:32-44).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...configs.yolox import YOLOXConfig
from ..backbones.csp_darknet import CSPDarknet
from ..heads.yolox_head import YOLOXHead
from ..necks.pafpn import YOLOXPAFPN


class YOLOX(nn.Module):
    cfg: YOLOXConfig

    @nn.compact
    def __call__(self, image):
        """image: [N, 3, H, W] (reference binding layout) -> per-level head maps."""
        cfg = self.cfg
        from ...quant.policy import set_quant_exclude

        set_quant_exclude(getattr(cfg, "quant_exclude", ()))
        x = image.transpose(0, 2, 3, 1).astype(jnp.dtype(cfg.dtype))
        feats = CSPDarknet(
            deepen_factor=cfg.deepen_factor,
            widen_factor=cfg.widen_factor,
            quant=cfg.quant,
            name="backbone",
        )(x)
        feats = YOLOXPAFPN(
            out_channels=cfg.neck_channels,
            num_csp_blocks=cfg.num_csp_blocks,
            quant=cfg.quant,
            name="neck",
        )(feats)
        return YOLOXHead(
            num_classes=cfg.num_classes,
            feat_channels=cfg.neck_channels,
            quant=cfg.quant,
            name="bbox_head",
        )(feats)
