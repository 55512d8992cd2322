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
            # the reference's CustomResNet downsample is a bare 3x3 conv
            # WITH bias and NO norm (bev_resnet.py:63-71: nn.Conv2d(curr,
            # out, 3, stride, 1) passed as BasicBlock.downsample) — match
            # it exactly so its checkpoints import weight-for-weight.
            identity = QConv(
                self.planes, (3, 3), (self.stride, self.stride), padding=1,
                use_bias=True, quant=self.quant, name="downsample_conv",
            )(x)
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
    """Bilinear align_corners=True upsample (FPN_LSS's nn.Upsample,
    lss_fpn.py:26-28).  jax.image.resize implements half-pixel centers
    (align_corners=False) — measured 0.78 max divergence on a toy ramp —
    so sample the corner-aligned grid explicitly: src = dst*(in-1)/(out-1).
    """
    n, h, w, c = x.shape
    oh, ow = h * scale, w * scale

    def axis_weights(out_n, in_n):
        if in_n == 1:
            lo = jnp.zeros(out_n, jnp.int32)
            return lo, lo, jnp.zeros(out_n, x.dtype)
        src = jnp.arange(out_n, dtype=jnp.float32) * ((in_n - 1) / (out_n - 1))
        lo = jnp.clip(jnp.floor(src), 0, in_n - 1).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_n - 1)
        return lo, hi, (src - lo.astype(jnp.float32)).astype(x.dtype)

    y0, y1, wy = axis_weights(oh, h)
    x0, x1, wx = axis_weights(ow, w)
    top = x[:, y0]
    bot = x[:, y1]
    rows = top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]
    left = rows[:, :, x0]
    right = rows[:, :, x1]
    return left * (1 - wx)[None, None, :, None] + right * wx[None, None, :, None]


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
