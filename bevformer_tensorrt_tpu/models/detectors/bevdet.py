"""BEVDet detector: image backbone/neck -> LSS view transformer -> BEV
encoder -> CenterPoint head.

TPU-native re-design of det2trt/models/detector/bevdet.py (BEVDetTRT
forward_trt :33-95: backbone -> CustomFPN -> depth-net softmax ->
bev_pool_v2 plugin -> CustomResNet+FPN_LSS -> CenterHead), with the rank
tensors precomputed host-side from calibration
(get_bev_pool_input :9-31 / tools/bevdet/pth2onnx.py:60-97).
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...configs.bevdet import BEVDetConfig
from ..backbones.bev_resnet import CustomResNet, FPN_LSS
from ..backbones.resnet import ResNet
from ..heads.centerpoint_head import CenterHead
from ..necks.fpn import FPN
from ..necks.view_transformer import LSSViewTransformer


class CustomFPN(nn.Module):
    """mmdet CustomFPN with out_ids=[0]: top-down over 2 levels, emit the
    finer one (reference config img_neck, bevdet-r50-cbgs.py:92-99)."""

    out_channels: int = 256
    quant: bool = False

    @nn.compact
    def __call__(self, inputs):
        from ..necks.fpn import _upsample_nearest_2x
        from ..layers import QConv

        laterals = [
            QConv(self.out_channels, (1, 1), padding=0, quant=self.quant, name=f"lateral{i}")(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = _upsample_nearest_2x(laterals[i])
            up = up[:, : laterals[i - 1].shape[1], : laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up
        return QConv(self.out_channels, (3, 3), padding=1, quant=self.quant, name="fpn0")(laterals[0])


class BEVDet(nn.Module):
    cfg: BEVDetConfig

    @nn.compact
    def __call__(self, image, ranks_depth, ranks_feat, ranks_bev,
                 interval_starts=None, interval_lengths=None) -> Dict[str, jax.Array]:
        """
        Args:
          image: [1, cams, 3, H, W] normalized input (reference binding layout).
          ranks_*: [P] int32 precomputed pooling ranks (static P, -1 pad).
          interval_*: optional [I] int32 segment boundaries — selects the
            TPU interval splat in bev_pool (ops/bev_pool.py impl='interval').
        Returns:
          CenterHead output maps dict (NHWC).
        """
        cfg = self.cfg
        from ...quant.policy import set_quant_exclude

        set_quant_exclude(getattr(cfg, "quant_exclude", ()))
        dtype = jnp.dtype(cfg.dtype)
        bs, cams = image.shape[:2]
        img = image.reshape(bs * cams, 3, cfg.input_h, cfg.input_w)
        img = img.transpose(0, 2, 3, 1).astype(dtype)

        feats = ResNet(
            depth=cfg.backbone_depth,
            out_indices=cfg.backbone_out_indices,
            dcn_stages=(False, False, False, False),
            style="pytorch",
            quant=cfg.quant,
            name="img_backbone",
        )(img)
        x = CustomFPN(out_channels=cfg.neck_out_channels, quant=cfg.quant, name="img_neck")(feats)

        bev = LSSViewTransformer(cfg, name="img_view_transformer")(
            x, ranks_depth, ranks_feat, ranks_bev, interval_starts, interval_lengths
        )  # [1, bev_h, bev_w, C_view]
        bev = bev.astype(dtype)

        feats_bev = CustomResNet(
            num_channels=cfg.bev_channels, quant=cfg.quant, name="img_bev_encoder_backbone"
        )(bev)
        bev = FPN_LSS(
            out_channels=cfg.bev_out_channels, quant=cfg.quant, name="img_bev_encoder_neck"
        )(feats_bev)

        return CenterHead(cfg, name="pts_bbox_head")(bev)
