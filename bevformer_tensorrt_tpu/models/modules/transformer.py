"""PerceptionTransformer: ego-motion shift, prev-BEV rotation, camera/level
embeddings, encoder + decoder orchestration.

TPU-native re-design of det2trt/models/modules/transformer.py
(PerceptionTransformerTRTP, :239-398).  `can_bus`, `lidar2img`,
`use_prev_bev` and `prev_bev` are traced tensors — one compiled graph per
model, with the recurrent prev_bev state carried by the host runtime
(runtime/engine.py), exactly like the reference's per-frame loop
(tools/bevformer/evaluate_trt.py:82-154).
"""
from __future__ import annotations

from typing import Callable, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...configs.bevformer import BEVFormerConfig
from ...ops import rotate
from ..layers import QDense
from .decoder import DetectionTransformerDecoder
from .encoder import BEVFormerEncoder


def can_bus_to_shift(can_bus, grid_length, bev_h, bev_w, use_shift: bool):
    """Ego-motion BEV shift (transformer.py:262-294). can_bus: [18]."""
    delta_x, delta_y = can_bus[0], can_bus[1]
    ego_angle = can_bus[-2] / np.pi * 180.0
    grid_length_y, grid_length_x = grid_length
    translation_length = jnp.sqrt(delta_x**2 + delta_y**2)
    # branch-free atan2 as in the reference (kept for exact parity with its
    # exported graph; jnp.arctan2 would also be fine on TPU)
    translation_angle = (
        jnp.arctan(delta_y / (delta_x + 1e-8))
        + ((1.0 - jnp.sign(delta_x)) / 2.0) * jnp.sign(delta_y) * np.pi
    ) / np.pi * 180.0
    bev_angle = ego_angle - translation_angle
    shift_y = translation_length * jnp.cos(bev_angle / 180.0 * np.pi) / grid_length_y / bev_h
    shift_x = translation_length * jnp.sin(bev_angle / 180.0 * np.pi) / grid_length_x / bev_w
    scale = 1.0 if use_shift else 0.0
    return jnp.stack([shift_x * scale, shift_y * scale])  # [2]


class PerceptionTransformer(nn.Module):
    cfg: BEVFormerConfig

    @nn.compact
    def __call__(
        self,
        mlvl_feats: List[jax.Array],  # per level [1, cams, H, W, C] (NHWC)
        bev_queries,                  # [nq, C] (bev embedding table)
        object_query_embed,           # [num_query, 2C]
        bev_pos,                      # [1, nq, C]
        can_bus,                      # [18]
        lidar2img,                    # [1, cams, 4, 4]
        prev_bev,                     # [nq, 1, C]
        use_prev_bev,                 # [] scalar 0/1
        reg_branches: Callable,
    ):
        cfg = self.cfg
        C = cfg.embed_dims
        nq = cfg.bev_h * cfg.bev_w

        shift = can_bus_to_shift(
            can_bus, cfg.grid_length, cfg.bev_h, cfg.bev_w, cfg.use_shift
        )

        # rotate prev BEV by the ego yaw delta (transformer.py:296-303)
        if cfg.rotate_prev_bev:
            rotation_angle = can_bus[-1]
            pb = prev_bev.reshape(cfg.bev_h, cfg.bev_w, C).transpose(2, 0, 1)
            pb = rotate(
                pb,
                rotation_angle,
                jnp.asarray(cfg.rotate_center, jnp.float32),
                interpolation="nearest",
            )
            prev_bev = pb.transpose(1, 2, 0).reshape(1, nq, C)
        else:
            prev_bev = prev_bev.reshape(1, nq, C)

        # can-bus embedding added to every BEV query (transformer.py:305-308)
        can_bus_feat = QDense(C // 2, quant=cfg.quant, name="can_bus_fc1")(
            can_bus.reshape(1, cfg.can_bus_dims)
        )
        can_bus_feat = nn.relu(can_bus_feat)
        can_bus_feat = QDense(C, quant=cfg.quant, name="can_bus_fc2")(can_bus_feat)
        can_bus_feat = nn.relu(can_bus_feat)
        can_bus_feat = nn.LayerNorm(epsilon=1e-5, name="can_bus_norm")(can_bus_feat)
        bev_q = bev_queries[None] + can_bus_feat[:, None, :] * (
            1.0 if cfg.use_can_bus else 0.0
        )  # [1, nq, C]

        # flatten multi-level camera features + cams/level embeds
        # (transformer.py:310-323)
        cams_embeds = self.param(
            "cams_embeds", nn.initializers.normal(1.0), (cfg.num_cams, C), jnp.float32
        )
        level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0), (cfg.num_levels, C), jnp.float32
        )
        dtype = jnp.dtype(cfg.dtype)
        flat = []
        spatial_shapes = []
        for lvl, feat in enumerate(mlvl_feats):
            _, cams, h, w, c = feat.shape
            f = feat.reshape(cams, h * w, c).astype(dtype)
            if cfg.use_cams_embeds:
                f = f + cams_embeds[:, None, :].astype(dtype)
            f = f + level_embeds[lvl][None, None, :].astype(dtype)
            flat.append(f)
            spatial_shapes.append((h, w))
        value = jnp.concatenate(flat, axis=1)  # [cams, keys, C]
        spatial_shapes = tuple(spatial_shapes)

        bev_embed = BEVFormerEncoder(cfg, name="encoder")(
            bev_q.astype(dtype),
            value,
            bev_pos.astype(dtype),
            lidar2img,
            prev_bev.astype(dtype),
            shift,
            use_prev_bev,
            spatial_shapes,
        )  # [1, nq, C]

        # decoder (transformer.py:376-394)
        query_pos, query = jnp.split(object_query_embed[None], 2, axis=-1)
        reference_points = jax.nn.sigmoid(
            QDense(3, quant=cfg.quant, name="reference_points")(query_pos)
        )  # [1, num_query, 3] — f32 (geometry)
        init_reference = reference_points

        inter_states, inter_refs = DetectionTransformerDecoder(cfg, name="decoder")(
            query.astype(dtype),
            query_pos.astype(dtype),
            bev_embed,
            reference_points.astype(jnp.float32),
            reg_branches,
        )
        return bev_embed.astype(jnp.float32), inter_states, init_reference, inter_refs
