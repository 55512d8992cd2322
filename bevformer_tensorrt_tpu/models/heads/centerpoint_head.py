"""CenterPoint head for BEVDet: shared conv + separate branch heads + decode.

TPU-native equivalent of the reference's CenterHead
(third_party/bev_mmdet3d/models/dense_heads/centerpoint_head.py, single-task
10-class variant per configs/bevdet/bevdet-r50-cbgs.py: share_conv 64,
common_heads reg(2)/height(1)/dim(3)/rot(2)/vel(2), heatmap 10,
init_bias=-2.19) and CenterPointBBoxCoder (max_num 500, score 0.1,
out_size_factor 8, voxel 0.1).  Decode is jit-compiled with a static top-k
and validity mask; Scale-NMS runs on host (core/nms.py), mirroring the
reference's torch-side NMS after the TRT engine.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...configs.bevdet import BEVDetConfig
from ..backbones.resnet import FrozenBN
from ..layers import QConv


class SeparateBranch(nn.Module):
    out_ch: int
    mid_ch: int = 64
    final_bias: float = 0.0
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        x = QConv(self.mid_ch, (3, 3), padding=1, use_bias=False, quant=self.quant, name="conv1")(x)
        x = FrozenBN(name="bn1")(x)
        x = nn.relu(x)
        # final_bias is the conv bias INITIALIZER (SeparateHead init_bias
        # -2.19 on the heatmap, centerpoint_head.py:95-100) — adding it at
        # runtime instead would double it under imported checkpoints.
        return QConv(
            self.out_ch, (3, 3), padding=1, quant=self.quant, name="conv2",
            bias_init=nn.initializers.constant(self.final_bias),
        )(x)


class CenterHead(nn.Module):
    cfg: BEVDetConfig

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        """x: [1, bev_h, bev_w, C] -> head maps (NHWC)."""
        cfg = self.cfg
        sc = cfg.share_conv_channel
        x = QConv(sc, (3, 3), padding=1, use_bias=False, quant=cfg.quant, name="shared_conv")(x)
        x = FrozenBN(name="shared_bn")(x)
        x = nn.relu(x)
        heads = {
            "reg": 2,
            "height": 1,
            "dim": 3,
            "rot": 2,
            "vel": 2,
            "heatmap": cfg.num_classes,
        }
        out = {}
        for name, ch in heads.items():
            out[name] = SeparateBranch(
                ch,
                mid_ch=sc,
                final_bias=-2.19 if name == "heatmap" else 0.0,
                quant=cfg.quant,
                name=name,
            )(x)
        return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def centerpoint_decode(cfg: BEVDetConfig, heads: Dict[str, jax.Array]):
    """CenterPointBBoxCoder.decode (centerpoint_head.py / mmdet3d coder):
    top-k over the sigmoid heatmap, gather regressions, build lidar-frame
    boxes [max_num, 9] + scores + labels + validity mask."""
    H, W = heads["heatmap"].shape[1:3]
    K = cfg.max_num
    heat = jax.nn.sigmoid(heads["heatmap"][0].astype(jnp.float32))  # [H, W, C]
    scores_flat = heat.transpose(2, 0, 1).reshape(-1)  # class-major
    top_scores, idx = jax.lax.top_k(scores_flat, K)
    labels = idx // (H * W)
    spatial = idx % (H * W)
    ys = (spatial // W).astype(jnp.float32)
    xs = (spatial % W).astype(jnp.float32)

    def gather(name):
        v = heads[name][0].astype(jnp.float32).reshape(H * W, -1)
        return v[spatial]

    reg = gather("reg")
    height = gather("height")
    dim = jnp.exp(gather("dim"))  # norm_bbox=True: dims are log-space
    rot = gather("rot")
    vel = gather("vel")

    xs = (xs + reg[:, 0]) * cfg.out_size_factor * cfg.voxel_size[0] + cfg.pc_range[0]
    ys = (ys + reg[:, 1]) * cfg.out_size_factor * cfg.voxel_size[1] + cfg.pc_range[1]
    yaw = jnp.arctan2(rot[:, 0], rot[:, 1])
    boxes = jnp.concatenate(
        [xs[:, None], ys[:, None], height, dim, yaw[:, None], vel], axis=-1
    )  # [K, 9] (x, y, z, w, l, h, yaw, vx, vy)

    rng = jnp.asarray(cfg.post_center_range, jnp.float32)
    valid = (
        jnp.all(boxes[:, :3] >= rng[:3], axis=1)
        & jnp.all(boxes[:, :3] <= rng[3:], axis=1)
        & (top_scores > cfg.score_threshold)
    )
    return boxes, top_scores, labels, valid


def centerpoint_post_process(cfg: BEVDetConfig, heads, nms=True):
    """Host-side: decode + Scale-NMS -> ragged numpy results."""
    from ...core.nms import scale_nms

    boxes, scores, labels, valid = centerpoint_decode(cfg, heads)
    b = np.asarray(boxes)[np.asarray(valid)]
    s = np.asarray(scores)[np.asarray(valid)]
    l = np.asarray(labels)[np.asarray(valid)]
    if nms and len(b):
        keep = scale_nms(
            b, s, l,
            iou_threshold=cfg.nms_thr,
            rescale_factors=cfg.nms_rescale_factor,
        )
        b, s, l = b[keep], s[keep], l[keep]
    return {"boxes_3d": b, "scores_3d": s, "labels_3d": l}
