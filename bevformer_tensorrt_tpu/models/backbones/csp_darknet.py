"""CSPDarknet backbone for YOLOX, NHWC flax.

TPU-native equivalent of mmdet's CSPDarknet as configured by the reference
(configs/yolox/yolox_x_8x8_300e_coco.py: deepen_factor=1.33,
widen_factor=1.25) and its QAT variant CSPDarknetQ
(det2trt/models/backbones/csp_darknet.py:14-194, residual quantizers in
det2trt/models/utils/scp_layer.py:66-79).  Focus stem (space-to-depth +
conv), 4 CSP stages (the last with SPP), SiLU activations.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...quant.qdq import QDQ
from ..layers import QConv


def silu(x):
    return x * jax.nn.sigmoid(x)


class ConvModule(nn.Module):
    """conv + BN(folded affine) + SiLU."""

    features: int
    kernel: int = 1
    stride: int = 1
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        from ..backbones.resnet import FrozenBN

        x = QConv(
            self.features,
            (self.kernel, self.kernel),
            (self.stride, self.stride),
            padding=(self.kernel - 1) // 2,
            use_bias=False,
            quant=self.quant,
            name="conv",
        )(x)
        x = FrozenBN(name="bn")(x)
        return silu(x)


class DarknetBottleneck(nn.Module):
    features: int
    add_identity: bool = True
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        out = ConvModule(self.features, 1, quant=self.quant, name="conv1")(x)
        out = ConvModule(self.features, 3, quant=self.quant, name="conv2")(out)
        if self.add_identity and x.shape[-1] == self.features:
            identity = x
            if self.quant:
                # residual quant site (reference scp_layer.py:66-79)
                identity = QDQ(name="qdq_residual")(identity)
            return out + identity
        return out


class CSPLayer(nn.Module):
    features: int
    num_blocks: int = 1
    add_identity: bool = True
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        mid = self.features // 2
        main = ConvModule(mid, 1, quant=self.quant, name="main_conv")(x)
        short = ConvModule(mid, 1, quant=self.quant, name="short_conv")(x)
        for i in range(self.num_blocks):
            main = DarknetBottleneck(
                mid, add_identity=self.add_identity, quant=self.quant, name=f"block{i}"
            )(main)
        out = jnp.concatenate([main, short], axis=-1)
        return ConvModule(self.features, 1, quant=self.quant, name="final_conv")(out)


class Focus(nn.Module):
    """Space-to-depth stem: [N,H,W,C] -> [N,H/2,W/2,4C] -> conv."""

    features: int
    kernel: int = 3
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        p = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        )
        return ConvModule(self.features, self.kernel, quant=self.quant, name="conv")(p)


class SPPBottleneck(nn.Module):
    features: int
    pool_sizes: Tuple[int, ...] = (5, 9, 13)
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        mid = x.shape[-1] // 2
        x = ConvModule(mid, 1, quant=self.quant, name="conv1")(x)
        pools = [x] + [
            nn.max_pool(x, (k, k), strides=(1, 1), padding=((k // 2, k // 2), (k // 2, k // 2)))
            for k in self.pool_sizes
        ]
        x = jnp.concatenate(pools, axis=-1)
        return ConvModule(self.features, 1, quant=self.quant, name="conv2")(x)


class CSPDarknet(nn.Module):
    """arch P5: stages (64, 128, 3), (128, 256, 9), (256, 512, 9),
    (512, 1024, 3, SPP); scaled by deepen/widen factors."""

    deepen_factor: float = 1.33
    widen_factor: float = 1.25
    out_indices: Tuple[int, ...] = (2, 3, 4)
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        def w(c):
            return int(c * self.widen_factor)

        def d(n):
            return max(round(n * self.deepen_factor), 1)

        outs = []
        x = Focus(w(64), quant=self.quant, name="stem")(x)
        if 0 in self.out_indices:
            outs.append(x)
        stages = [(128, 3, False), (256, 9, False), (512, 9, False), (1024, 3, True)]
        for i, (ch, n, spp) in enumerate(stages, start=1):
            x = ConvModule(w(ch), 3, 2, quant=self.quant, name=f"stage{i}_down")(x)
            if spp:
                x = SPPBottleneck(w(ch), quant=self.quant, name=f"stage{i}_spp")(x)
            x = CSPLayer(
                w(ch), d(n), add_identity=not spp, quant=self.quant, name=f"stage{i}_csp"
            )(x)
            if i in self.out_indices:
                outs.append(x)
        return outs
