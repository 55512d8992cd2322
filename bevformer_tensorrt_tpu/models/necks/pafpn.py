"""YOLOX PAFPN neck (top-down + bottom-up CSP paths), NHWC flax.

Equivalent of mmdet's YOLOXPAFPN as configured by the reference
(configs/yolox/yolox_x_8x8_300e_coco.py: in [320, 640, 1280], out 320,
num_csp_blocks=4).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.csp_darknet import CSPLayer, ConvModule
from .fpn import _upsample_nearest_2x


class YOLOXPAFPN(nn.Module):
    out_channels: int = 320
    num_csp_blocks: int = 4
    quant: bool = False

    @nn.compact
    def __call__(self, inputs):
        c = self.out_channels
        n = len(inputs)
        # top-down
        inner = list(inputs)
        for i in range(n - 1, 0, -1):
            inner[i] = ConvModule(c, 1, quant=self.quant, name=f"reduce{i}")(inner[i])
            up = _upsample_nearest_2x(inner[i])
            up = up[:, : inner[i - 1].shape[1], : inner[i - 1].shape[2]]
            cat = jnp.concatenate([up, inner[i - 1]], axis=-1)
            inner[i - 1] = CSPLayer(
                c if i - 1 == 0 else inputs[i - 1].shape[-1],
                self.num_csp_blocks,
                add_identity=False,
                quant=self.quant,
                name=f"td_csp{i - 1}",
            )(cat)
        # bottom-up
        outs = [inner[0]]
        for i in range(n - 1):
            down = ConvModule(outs[i].shape[-1], 3, 2, quant=self.quant, name=f"down{i}")(outs[i])
            cat = jnp.concatenate([down, inner[i + 1]], axis=-1)
            outs.append(
                CSPLayer(
                    inner[i + 1].shape[-1],
                    self.num_csp_blocks,
                    add_identity=False,
                    quant=self.quant,
                    name=f"bu_csp{i}",
                )(cat)
            )
        return [
            ConvModule(c, 1, quant=self.quant, name=f"out{i}")(o) for i, o in enumerate(outs)
        ]
