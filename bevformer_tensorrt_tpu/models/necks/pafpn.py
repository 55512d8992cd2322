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
        """mmdet YOLOXPAFPN channel plan, exactly (for reference-checkpoint
        import): reduce_layers[k] maps level n-1-k down to the NEXT-LOWER
        level's width (not out_channels); the reduced tensor is what the
        bottom-up path concatenates with; bottom_up_blocks[k] emits
        in_channels[k+1].  Module names index like mmdet's lists:
        reduce{k} = reduce_layers.{k}, td_csp{k} = top_down_blocks.{k},
        down{k} = downsamples.{k}, bu_csp{k} = bottom_up_blocks.{k},
        out{k} = out_convs.{k}."""
        c = self.out_channels
        n = len(inputs)
        # top-down (mmdet iterates deepest-first; list index k = n-1-idx)
        inner = [inputs[-1]]
        for idx in range(n - 1, 0, -1):
            k = n - 1 - idx
            feat_low = inputs[idx - 1]
            feat_high = ConvModule(
                feat_low.shape[-1], 1, quant=self.quant, name=f"reduce{k}"
            )(inner[0])
            inner[0] = feat_high
            up = _upsample_nearest_2x(feat_high)
            up = up[:, : feat_low.shape[1], : feat_low.shape[2]]
            cat = jnp.concatenate([up, feat_low], axis=-1)
            inner.insert(
                0,
                CSPLayer(
                    feat_low.shape[-1],
                    self.num_csp_blocks,
                    add_identity=False,
                    quant=self.quant,
                    name=f"td_csp{k}",
                )(cat),
            )
        # bottom-up
        outs = [inner[0]]
        for k in range(n - 1):
            down = ConvModule(
                outs[k].shape[-1], 3, 2, quant=self.quant, name=f"down{k}"
            )(outs[k])
            cat = jnp.concatenate([down, inner[k + 1]], axis=-1)
            outs.append(
                CSPLayer(
                    inputs[k + 1].shape[-1],
                    self.num_csp_blocks,
                    add_identity=False,
                    quant=self.quant,
                    name=f"bu_csp{k}",
                )(cat)
            )
        return [
            ConvModule(c, 1, quant=self.quant, name=f"out{i}")(o) for i, o in enumerate(outs)
        ]
