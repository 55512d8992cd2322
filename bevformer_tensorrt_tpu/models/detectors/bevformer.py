"""BEVFormer detector: backbone -> FPN -> BEVFormerHead.

TPU-native re-design of det2trt/models/detector/bevformer.py (BEVFormerTRT,
forward_trt :37-44): one jittable function of
(image, prev_bev, use_prev_bev, can_bus, lidar2img) ->
(bev_embed, outputs_classes, outputs_coords) with bs=1, static shapes.
The recurrent prev_bev/can_bus temporal state machine lives in
runtime/engine.py (host side), mirroring tools/bevformer/evaluate_trt.py:82-154.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...configs.bevformer import BEVFormerConfig
from ..backbones.resnet import ResNet
from ..heads.bevformer_head import BEVFormerHead
from ..necks.fpn import FPN


class BEVFormer(nn.Module):
    cfg: BEVFormerConfig

    @nn.compact
    def __call__(self, image, prev_bev, use_prev_bev, can_bus, lidar2img):
        """
        Args:
          image:        [1, cams, 3, H, W] (reference binding layout, NCHW)
          prev_bev:     [bev_h*bev_w, 1, C]
          use_prev_bev: [] or [1] scalar 0/1
          can_bus:      [18]
          lidar2img:    [1, cams, 4, 4]
        Returns:
          bev_embed [nq, 1, C], outputs_classes [L, 1, num_query, classes],
          outputs_coords [L, 1, num_query, code_size]
        """
        cfg = self.cfg
        # publish the mixed-precision policy for this trace (the config is a
        # module field, so a policy change retraces under jit)
        from ...quant.policy import set_quant_exclude

        set_quant_exclude(getattr(cfg, "quant_exclude", ()))
        dtype = jnp.dtype(cfg.dtype)
        bs, cams = image.shape[:2]
        img = image.reshape(bs * cams, 3, cfg.img_h, cfg.img_w)
        img = img.transpose(0, 2, 3, 1).astype(dtype)  # NCHW -> NHWC

        style = "caffe" if cfg.backbone_depth == 101 else "pytorch"
        feats = ResNet(
            depth=cfg.backbone_depth,
            out_indices=cfg.backbone_out_indices,
            dcn_stages=cfg.dcn_stages,
            style=style,
            quant=cfg.quant,
            name="img_backbone",
        )(img)
        feats = FPN(
            out_channels=cfg.embed_dims,
            num_outs=cfg.num_levels,
            quant=cfg.quant,
            name="img_neck",
        )(feats)
        # [cams, H, W, C] -> [1, cams, H, W, C]; stay in compute dtype — the
        # encoder/decoder run in bf16 on TPU (upcasting here OOMs base on a
        # 16 GB chip), geometry & outputs are handled in f32 downstream.
        mlvl = [f.reshape(bs, cams, *f.shape[1:]).astype(dtype) for f in feats]

        return BEVFormerHead(cfg, name="pts_bbox_head")(
            mlvl,
            prev_bev,
            can_bus.reshape(-1),
            lidar2img,
            jnp.asarray(use_prev_bev, jnp.float32).reshape(()),
        )
