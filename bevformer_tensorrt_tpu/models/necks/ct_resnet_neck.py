"""CenterNet deconv neck (CTResNetNeck), NHWC flax.

Equivalent of mmdet's CTResNetNeck as configured by the reference
(configs/centernet/centernet_resnet18_dcnv2_140e_coco.py: 3 deconv stages
256/128/64 with DCNv2 before each deconv).  Transposed conv 4x4 stride 2;
the DCN uses the shared modulated_deform_conv2d op (ops/dcn.py).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.resnet import DeformConv2d, FrozenBN


class CTResNetNeck(nn.Module):
    num_deconv_filters: Tuple[int, ...] = (256, 128, 64)
    use_dcn: bool = True
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        """x: [N, H, W, C] deepest backbone feature -> upsampled x8."""
        for i, ch in enumerate(self.num_deconv_filters):
            if self.use_dcn:
                x = DeformConv2d(ch, (1, 1), quant=self.quant, name=f"dcn{i}")(x)
            else:
                from ..layers import QConv

                x = QConv(ch, (3, 3), padding=1, use_bias=False, quant=self.quant, name=f"conv{i}")(x)
            x = FrozenBN(name=f"dcn_bn{i}")(x)
            x = nn.relu(x)
            x = nn.ConvTranspose(
                ch, (4, 4), strides=(2, 2), padding="SAME", use_bias=False, name=f"deconv{i}"
            )(x)
            x = FrozenBN(name=f"deconv_bn{i}")(x)
            x = nn.relu(x)
        return x
