"""ResNet-50/101 backbone with optional DCNv2 stages, NHWC, flax.

TPU-native equivalent of the reference's mmcv ResNet as configured by
configs/bevformer/bevformer_{tiny,base}.py (R50 pytorch-style / R101
caffe-style with DCN on stages 3-4) and the QAT variant ResNetQ
(det2trt/models/backbones/resnet.py:326-686, residual-add TensorQuantizer).

Design: NHWC layout (TPU-native), frozen BatchNorm folded as an affine
(norm_eval=True in every reference config — BN never updates), and the DCN
stage's conv2 replaced by conv_offset + the modulated_deform_conv2d op.
Quantization sites: every QConv input + the residual add (the reference's
ResNetQ quantizes the residual sum input the same way).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import modulated_deform_conv2d
from ...quant.policy import effective_quant
from ...quant.qdq import QDQ
from ..layers import QConv

STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}
BASIC_DEPTHS = (18, 34)


class FrozenBN(nn.Module):
    """BatchNorm in eval mode: y = (x - mean) / sqrt(var + eps) * gamma + beta.
    Parameters live in 'params' (gamma/beta) and 'batch_stats' (mean/var)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,), jnp.float32)
        var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,), jnp.float32)
        inv = jax.lax.rsqrt(var.value + self.eps) * gamma
        shift = beta - mean.value * inv
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)


class DeformConv2d(nn.Module):
    """DCNv2 block: plain conv predicts offsets+mask, the fused op samples.
    (reference det2trt/models/modules/cnn/dcn.py DCNv2P; mmcv layout)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    deform_groups: int = 1
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        dg = self.deform_groups
        off_mask = QConv(
            dg * 27, (3, 3), self.strides, padding=1, quant=self.quant, name="conv_offset"
        )(x)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, x.shape[-1], self.features), jnp.float32
        )
        # mmcv ModulatedDeformConv2dPack semantics: conv_offset's output
        # channels are ALREADY per-tap interleaved — torch.chunk(out, 3)
        # followed by cat((o1, o2)) is a no-op on the first 2*ntap
        # channels, so ch 2t = y-offset of tap t, 2t+1 = x-offset, and the
        # last ntap are the mask logits.  (Round-2 fix: the previous
        # [y-taps | x-taps] reading was self-consistent for from-scratch
        # training but misinterpreted every imported mmcv DCN checkpoint.)
        # Everything stays NHWC — the op's NHWC layout path packs its
        # gather table channel-last and emits pixels-major, so neither the
        # feature map nor the output pays an NCHW relayout.
        ntap = dg * 9
        offset = off_mask[..., : 2 * ntap]
        mask = jax.nn.sigmoid(off_mask[..., 2 * ntap :])
        w = kernel.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        return modulated_deform_conv2d(
            x,
            offset,
            mask,
            w,
            None,
            stride=self.strides[0],
            padding=1,
            dilation=1,
            groups=1,
            deform_groups=dg,
            quant="int8"
            if effective_quant(self.quant, self.path + ("dcn_tables",)) == "int8"
            else False,
            layout="NHWC",
        )


class Bottleneck(nn.Module):
    planes: int
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    style: str = "pytorch"  # 'pytorch': stride on 3x3; 'caffe': stride on first 1x1
    dcn: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        s1 = self.strides if self.style == "caffe" else (1, 1)
        s2 = (1, 1) if self.style == "caffe" else self.strides
        out = QConv(self.planes, (1, 1), s1, padding=0, use_bias=False, quant=self.quant, name="conv1")(x)
        out = FrozenBN(name="bn1")(out)
        out = nn.relu(out)
        if self.dcn:
            out = DeformConv2d(self.planes, s2, quant=self.quant, name="conv2")(out)
        else:
            out = QConv(self.planes, (3, 3), s2, padding=1, use_bias=False, quant=self.quant, name="conv2")(out)
        out = FrozenBN(name="bn2")(out)
        out = nn.relu(out)
        out = QConv(self.planes * 4, (1, 1), (1, 1), padding=0, use_bias=False, quant=self.quant, name="conv3")(out)
        out = FrozenBN(name="bn3")(out)

        if self.downsample:
            identity = QConv(
                self.planes * 4, (1, 1), self.strides, padding=0, use_bias=False,
                quant=self.quant, name="downsample_conv",
            )(x)
            identity = FrozenBN(name="downsample_bn")(identity)
        else:
            identity = x
        if self.quant:
            # residual-add quantization site (reference ResNetQ residual
            # TensorQuantizer, det2trt/models/backbones/resnet.py:326-686)
            identity = QDQ(name="qdq_residual")(identity)
        return nn.relu(out + identity)


class ResNetBasicBlock(nn.Module):
    """Two-conv residual block for R18/R34 (CenterNet backbone)."""

    planes: int
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        out = QConv(self.planes, (3, 3), self.strides, padding=1, use_bias=False, quant=self.quant, name="conv1")(x)
        out = FrozenBN(name="bn1")(out)
        out = nn.relu(out)
        out = QConv(self.planes, (3, 3), padding=1, use_bias=False, quant=self.quant, name="conv2")(out)
        out = FrozenBN(name="bn2")(out)
        if self.downsample:
            identity = QConv(
                self.planes, (1, 1), self.strides, padding=0, use_bias=False,
                quant=self.quant, name="downsample_conv",
            )(x)
            identity = FrozenBN(name="downsample_bn")(identity)
        else:
            identity = x
        if self.quant:
            identity = QDQ(name="qdq_residual")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    depth: int = 101
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dcn_stages: Tuple[bool, ...] = (False, False, False, False)
    style: str = "pytorch"
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        """x: [N, H, W, 3] -> list of stage features (NHWC)."""
        blocks = STAGE_BLOCKS[self.depth]
        basic = self.depth in BASIC_DEPTHS
        x = QConv(64, (7, 7), (2, 2), padding=3, use_bias=False, quant=self.quant, name="stem_conv")(x)
        x = FrozenBN(name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = 64
        for stage in range(4):
            stride = (1, 1) if stage == 0 else (2, 2)
            for b in range(blocks[stage]):
                if basic:
                    x = ResNetBasicBlock(
                        planes=planes,
                        strides=stride if b == 0 else (1, 1),
                        downsample=(b == 0 and stage > 0),
                        quant=self.quant,
                        name=f"stage{stage}_block{b}",
                    )(x)
                else:
                    x = Bottleneck(
                        planes=planes,
                        strides=stride if b == 0 else (1, 1),
                        downsample=(b == 0),
                        style=self.style,
                        dcn=self.dcn_stages[stage],
                        quant=self.quant,
                        name=f"stage{stage}_block{b}",
                    )(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return outs
