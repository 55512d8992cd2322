"""FPN neck, NHWC, mmdet semantics.

Equivalent of the reference's mmdet FPN as configured in
configs/bevformer/bevformer_base.py:56-64 (start_level=0,
add_extra_convs='on_output', relu_before_extra_convs=True) — lateral 1x1
convs, nearest 2x top-down pathway, 3x3 output convs, extra stride-2 convs
on the last output for num_outs > len(inputs).
"""
from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import QConv


def _upsample_nearest_2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 4
    relu_before_extra_convs: bool = True
    quant: bool = False

    @nn.compact
    def __call__(self, inputs: List[jax.Array]) -> List[jax.Array]:
        n_in = len(inputs)
        laterals = [
            QConv(self.out_channels, (1, 1), padding=0, quant=self.quant, name=f"lateral{i}")(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(n_in - 1, 0, -1):
            up = _upsample_nearest_2x(laterals[i])
            # crop in case of odd spatial dims (mmdet uses size-matched interp)
            up = up[:, : laterals[i - 1].shape[1], : laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            QConv(self.out_channels, (3, 3), padding=1, quant=self.quant, name=f"fpn{i}")(laterals[i])
            for i in range(n_in)
        ]
        for i in range(n_in, self.num_outs):
            src = outs[-1]
            if i > n_in and self.relu_before_extra_convs:
                src = nn.relu(src)
            outs.append(
                QConv(
                    self.out_channels, (3, 3), (2, 2), padding=1, quant=self.quant, name=f"fpn{i}"
                )(src)
            )
        return outs
