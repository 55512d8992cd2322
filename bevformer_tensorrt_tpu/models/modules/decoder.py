"""DETR-style detection decoder with iterative box refinement.

TPU-native re-design of the reference decoder
(det2trt/models/modules/decoder.py:40-113 DetectionTransformerDecoderTRTP +
DetrTransformerDecoderLayer ordering self_attn -> norm -> cross_attn ->
norm -> ffn -> norm).  The reg branches are applied inside the loop to
refine reference points (with_box_refine=True); all intermediate states are
stacked for the per-level cls/reg heads.
"""
from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...configs.bevformer import BEVFormerConfig
from ..layers import FFN, inverse_sigmoid
from .attention import CustomMSDeformableAttention, MultiheadAttention


class DecoderLayer(nn.Module):
    cfg: BEVFormerConfig

    @nn.compact
    def __call__(self, query, query_pos, value, reference_points_2d, spatial_shapes):
        cfg = self.cfg
        identity = query
        # keep the query path in the compute dtype (flax LayerNorm would
        # promote to f32 and pin every downstream matmul there)
        dt = query.dtype
        query = MultiheadAttention(
            embed_dims=cfg.embed_dims, num_heads=cfg.num_heads, quant=cfg.quant,
            name="self_attn",
        )(query, query, query, identity, query_pos, query_pos)
        query = nn.LayerNorm(epsilon=1e-5, name="norm1")(query).astype(dt)
        identity = query
        query = CustomMSDeformableAttention(
            embed_dims=cfg.embed_dims,
            num_heads=cfg.num_heads,
            num_levels=1,
            num_points=cfg.num_points_decoder,
            quant=cfg.quant,
            msda_impl=cfg.msda_impl,
            name="cross_attn",
        )(query, value, identity, query_pos, reference_points_2d, spatial_shapes)
        query = nn.LayerNorm(epsilon=1e-5, name="norm2")(query).astype(dt)
        query = FFN(cfg.embed_dims, cfg.ffn_dims, quant=cfg.quant, name="ffn")(query)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(query).astype(dt)


class DetectionTransformerDecoder(nn.Module):
    """Returns (inter_states [num_layers, 1, nq, C],
                inter_refs   [num_layers, 1, nq, 3])."""

    cfg: BEVFormerConfig

    @nn.compact
    def __call__(
        self,
        query,             # [1, nq, C]
        query_pos,         # [1, nq, C]
        value,             # [1, bev_h*bev_w, C]
        reference_points,  # [1, nq, 3] sigmoid space
        reg_branches: Callable,  # lid, x -> [1, nq, code_size]
    ):
        cfg = self.cfg
        spatial_shapes = ((cfg.bev_h, cfg.bev_w),)
        inter_states, inter_refs = [], []
        for lid in range(cfg.decoder_layers):
            ref_2d = reference_points[..., :2].reshape(1, -1, 1, 2)
            query = DecoderLayer(cfg, name=f"layer{lid}")(
                query, query_pos, value, ref_2d, spatial_shapes
            )
            tmp = reg_branches(lid, query).astype(jnp.float32)  # [1, nq, code_size]
            # iterative refinement (decoder.py:92-103): xy from tmp[0:2],
            # z from tmp[4:5], added in inverse-sigmoid space (f32 geometry).
            reference_points = jax.nn.sigmoid(
                jnp.concatenate(
                    [
                        tmp[..., 0:2] + inverse_sigmoid(reference_points[..., 0:2]),
                        tmp[..., 4:5] + inverse_sigmoid(reference_points[..., 2:3]),
                    ],
                    axis=-1,
                )
            )
            inter_states.append(query)
            inter_refs.append(reference_points)
        return jnp.stack(inter_states), jnp.stack(inter_refs)
