"""BEV-space encoder: CustomResNet (BasicBlock stages) + FPN_LSS neck.

TPU-native equivalent of the reference's BEVDet BEV encoder
(third_party/bev_mmdet3d/models/backbones/resnet.py CustomResNet — 3 stages
of 2 BasicBlocks, stride 2 each — and models/necks/lss_fpn.py FPN_LSS:
upsample the deepest stage x4 bilinear align_corners, concat with stage 0,
two 3x3 conv+BN+ReLU, then a x2 upsample + 3x3 + 1x1 head).  NHWC, trainable
BN replaced by the frozen-affine FrozenBN (inference framework; the
reference's BEVDet trains BN but deploys it folded the same way).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import QConv
from .resnet import FrozenBN


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        out = QConv(
            self.planes, (3, 3), (self.stride, self.stride), padding=1,
            use_bias=False, quant=self.quant, name="conv1",
        )(x)
        out = FrozenBN(name="bn1")(out)
        out = nn.relu(out)
        out = QConv(self.planes, (3, 3), padding=1, use_bias=False, quant=self.quant, name="conv2")(out)
        out = FrozenBN(name="bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = QConv(
                self.planes, (1, 1), (self.stride, self.stride), padding=0,
                use_bias=False, quant=self.quant, name="downsample_conv",
            )(x)
            identity = FrozenBN(name="downsample_bn")(identity)
        else:
            identity = x
        return nn.relu(out + identity)


class CustomResNet(nn.Module):
    """3 stages x 2 BasicBlocks, stride 2 each; returns all stage outputs."""

    num_channels: Tuple[int, ...] = (128, 256, 512)
    blocks_per_stage: int = 2
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        outs = []
        for s, ch in enumerate(self.num_channels):
            for b in range(self.blocks_per_stage):
                x = BasicBlock(
                    planes=ch,
                    stride=2 if b == 0 else 1,
                    quant=self.quant,
                    name=f"stage{s}_block{b}",
                )(x)
            outs.append(x)
        return outs


def upsample_bilinear(x, scale: int):
    """Bilinear align_corners=True upsample (FPN_LSS's nn.Upsample)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * scale, w * scale, c), method="linear")


class FPN_LSS(nn.Module):
    """lss_fpn.py:11-90: concat(up4(deepest), stage0) -> 2x conv -> up2 head."""

    out_channels: int = 256
    quant: bool = False

    @nn.compact
    def __call__(self, feats):
        x_low, x_high = feats[0], feats[2]
        up = upsample_bilinear(x_high, 4)
        x = jnp.concatenate([x_low, up], axis=-1)
        ch = self.out_channels * 2
        x = QConv(ch, (3, 3), padding=1, use_bias=False, quant=self.quant, name="conv1")(x)
        x = FrozenBN(name="bn1")(x)
        x = nn.relu(x)
        x = QConv(ch, (3, 3), padding=1, use_bias=False, quant=self.quant, name="conv2")(x)
        x = FrozenBN(name="bn2")(x)
        x = nn.relu(x)
        # extra_upsample head: up2 -> 3x3 -> 1x1
        x = upsample_bilinear(x, 2)
        x = QConv(self.out_channels, (3, 3), padding=1, use_bias=False, quant=self.quant, name="up_conv")(x)
        x = FrozenBN(name="up_bn")(x)
        x = nn.relu(x)
        return QConv(self.out_channels, (1, 1), padding=0, quant=self.quant, name="out_conv")(x)
