"""CenterNet head + decode, NHWC flax.

Equivalent of mmdet's CenterNetHead as deployed by the reference
(det2trt/models/detector/centernet.py CenterNetTRT :7-34; QAT variant
CenterNetHeadQ det2trt/models/dense_heads/centernet_head.py:28-39):
3 branches (heatmap C, wh 2, offset 2), decode = 3x3 local-maximum
suppression on the sigmoid heatmap + static top-k.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import QConv


class CenterNetHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 64
    quant: bool = False

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        def branch(out_ch, bias, name):
            h = QConv(self.feat_channels, (3, 3), padding=1, quant=self.quant, name=f"{name}_conv")(x)
            h = nn.relu(h)
            # `bias` is the final conv's bias INITIALIZER (mmdet
            # bias_init_with_prob(0.1) = -2.19 on the heatmap) — a runtime
            # add would double it under imported checkpoints.
            h = QConv(
                out_ch, (1, 1), padding=0, quant=self.quant, name=f"{name}_out",
                bias_init=nn.initializers.constant(bias),
            )(h)
            return h

        return {
            "heatmap": branch(self.num_classes, -2.19, "heatmap"),
            "wh": branch(2, 0.0, "wh"),
            "offset": branch(2, 0.0, "offset"),
        }


@functools.partial(jax.jit, static_argnames=("k", "kernel", "stride"))
def centernet_decode(
    heads: Dict[str, jax.Array],
    k: int = 100,
    kernel: int = 3,
    stride: int = 4,
):
    """mmdet CenterNetHead.decode_heatmap: local-max NMS via max-pool equality,
    top-k, gather wh/offset, boxes in input-image pixels.
    Returns (boxes [n, k, 4] xyxy, scores [n, k], labels [n, k])."""
    heat = jax.nn.sigmoid(heads["heatmap"].astype(jnp.float32))  # [n, H, W, C]
    pad = kernel // 2
    hmax = nn.max_pool(heat, (kernel, kernel), strides=(1, 1), padding=((pad, pad), (pad, pad)))
    heat = jnp.where(hmax == heat, heat, 0.0)

    n, H, W, C = heat.shape
    flat = heat.transpose(0, 3, 1, 2).reshape(n, -1)  # class-major
    scores, idx = jax.lax.top_k(flat, k)
    labels = idx // (H * W)
    spatial = idx % (H * W)
    ys = (spatial // W).astype(jnp.float32)
    xs = (spatial % W).astype(jnp.float32)

    def gather(name):
        v = heads[name].astype(jnp.float32).reshape(n, H * W, -1)
        return jnp.take_along_axis(v, spatial[..., None], axis=1)

    wh = gather("wh")
    off = gather("offset")
    cx = (xs + off[..., 0]) * stride
    cy = (ys + off[..., 1]) * stride
    bw = wh[..., 0] * stride
    bh = wh[..., 1] * stride
    boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1)
    return boxes, scores, labels
