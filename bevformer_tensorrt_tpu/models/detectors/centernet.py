"""CenterNet detector (ResNet18 + CTResNetNeck + CenterNetHead).

TPU-native equivalent of det2trt/models/detector/centernet.py
(CenterNetTRT :7-34).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...configs.centernet import CenterNetConfig
from ..backbones.resnet import ResNet
from ..heads.centernet_head import CenterNetHead
from ..necks.ct_resnet_neck import CTResNetNeck


class CenterNet(nn.Module):
    cfg: CenterNetConfig

    @nn.compact
    def __call__(self, image):
        """image: [N, 3, H, W] -> head maps dict (stride-4 NHWC)."""
        cfg = self.cfg
        from ...quant.policy import set_quant_exclude

        set_quant_exclude(getattr(cfg, "quant_exclude", ()))
        x = image.transpose(0, 2, 3, 1).astype(jnp.dtype(cfg.dtype))
        feats = ResNet(
            depth=cfg.backbone_depth,
            out_indices=(3,),
            quant=cfg.quant,
            name="backbone",
        )(x)
        x = CTResNetNeck(
            num_deconv_filters=cfg.deconv_filters,
            use_dcn=cfg.use_dcn,
            quant=cfg.quant,
            name="neck",
        )(feats[0])
        return CenterNetHead(
            num_classes=cfg.num_classes,
            feat_channels=cfg.deconv_filters[-1],
            quant=cfg.quant,
            name="bbox_head",
        )(x)
