"""BEVFormer attention modules (flax).

TPU-native re-designs of the reference modules:
  * TemporalSelfAttention    (det2trt/models/modules/temporal_self_attention.py)
  * SpatialCrossAttention + MSDeformableAttention3D
                             (det2trt/models/modules/spatial_cross_attention.py)
  * CustomMSDeformableAttention (decoder cross-attn, det2trt/.../decoder.py:116-347)
  * MultiheadAttention       (decoder self-attn, det2trt/.../multi_head_attention.py)

All are batch-first, static-shaped, single-sample (bs=1) with the camera /
BEV-queue axes folded into the op batch exactly like the TRTP plugin path —
which is also the natural JAX formulation.  The fused MSDA op (softmax of
raw logits inside) is `ops.multi_scale_deformable_attn`; dropout is omitted
(inference framework; QAT fine-tuning keeps deterministic eval semantics as
the reference's 1-epoch QAT does).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops import multi_scale_deformable_attn, multi_head_attention
from ...quant.qdq import QDQ
from ..layers import QDense


class TemporalSelfAttention(nn.Module):
    """Deformable self-attention over the 2-frame BEV queue.

    Contract (reference temporal_self_attention.py:118-313, TRTP variant):
      query [1, Nq, C]; value = stacked [2, Nq, C] (prev_bev, current);
      offsets/weights are predicted from concat(prev_bev, query) [1, Nq, 2C],
      one set per queue entry; MSDA runs with the queue folded into batch;
      outputs of the two queue entries are averaged, projected, residual-added.
    """

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    num_bev_queue: int = 2
    quant: bool = False

    @nn.compact
    def __call__(
        self,
        query,            # [1, Nq, C]
        value,            # [2, Nq, C] = [prev_bev, current bev]
        identity,         # [1, Nq, C]
        query_pos,        # [1, Nq, C]
        reference_points,  # [2, Nq, 1, 2] hybrid (shifted prev ref, ref)
        spatial_shapes: Tuple[Tuple[int, int], ...],  # ((bev_h, bev_w),)
    ):
        C, H, L, P, Q = (
            self.embed_dims,
            self.num_heads,
            self.num_levels,
            self.num_points,
            self.num_bev_queue,
        )
        nq = query.shape[1]
        if query_pos is not None:
            query = query + query_pos
        # concat prev-frame BEV with the (pos-augmented) query for offset pred
        qcat = jnp.concatenate([value[0:1], query], axis=-1)  # [1, Nq, 2C]

        v = QDense(C, quant=self.quant, name="value_proj")(value)
        v = v.reshape(Q, nq, H, C // H)

        off = QDense(Q * H * L * P * 2, quant=self.quant, name="sampling_offsets")(qcat)
        attn = QDense(Q * H * L * P, quant=self.quant, name="attention_weights")(qcat)
        # [1, Nq, H, Q, L*P*2] -> queue folded into batch: [Q, Nq, H, L*P*2]
        off = off.reshape(nq, H, Q, L * P * 2).transpose(2, 0, 1, 3)
        attn = attn.reshape(nq, H, Q, L * P).transpose(2, 0, 1, 3)

        out = multi_scale_deformable_attn(
            v, reference_points.reshape(Q, nq, 1, 2), off, attn, spatial_shapes
        )  # [Q, Nq, C]
        out = out.mean(axis=0, keepdims=True)  # fuse history & current
        out = QDense(C, quant=self.quant, name="output_proj")(out)
        return out + (query if identity is None else identity)


class MSDeformableAttention3D(nn.Module):
    """Per-camera deformable attention over multi-level image features
    (reference spatial_cross_attention.py:277-768, TRTP path).  No output
    projection / residual — SpatialCrossAttention owns those."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 8
    quant: bool = False

    @nn.compact
    def __call__(
        self,
        query,             # [num_cams, Nq, C]
        value,             # [num_cams, num_keys, C]
        reference_points,  # [num_cams, Nq, 1, ppg*2]  (ppg = pillar points)
        spatial_shapes: Tuple[Tuple[int, int], ...],
    ):
        C, H = self.embed_dims, self.num_heads
        cams, nq = query.shape[:2]
        L, P = self.num_levels, self.num_points

        v = QDense(C, quant=self.quant, name="value_proj")(value)
        v = v.reshape(cams, -1, H, C // H)
        off = QDense(H * L * P * 2, quant=self.quant, name="sampling_offsets")(query)
        attn = QDense(H * L * P, quant=self.quant, name="attention_weights")(query)
        off = off.reshape(cams, nq, H, L * P * 2)
        attn = attn.reshape(cams, nq, H, L * P)
        return multi_scale_deformable_attn(v, reference_points, off, attn, spatial_shapes)


class SpatialCrossAttention(nn.Module):
    """Camera-folded spatial cross-attention (reference
    spatial_cross_attention.py:181-273, TRTP path): broadcast the BEV query
    to every camera, run MSDA3D per camera, then combine with the normalized
    bev_mask weights (hit-count normalization folded into the mask by the
    encoder's point_sampling — encoder.py:256-258)."""

    embed_dims: int = 256
    num_cams: int = 6
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 8
    quant: bool = False

    @nn.compact
    def __call__(
        self,
        query,                 # [1, Nq, C]
        value,                 # [num_cams, num_keys, C]
        identity,              # [1, Nq, C] or None
        query_pos,             # [1, Nq, C]
        reference_points_cam,  # [num_cams, Nq, ppg*2]
        bev_mask,              # [num_cams, Nq, 1] normalized weights
        spatial_shapes: Tuple[Tuple[int, int], ...],
    ):
        inp_residual = query if identity is None else identity
        if query_pos is not None:
            query = query + query_pos

        q = jnp.broadcast_to(query, (self.num_cams, query.shape[1], self.embed_dims))
        ref = reference_points_cam.reshape(self.num_cams, query.shape[1], 1, -1)
        queries = MSDeformableAttention3D(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_levels=self.num_levels,
            num_points=self.num_points,
            quant=self.quant,
            name="deformable_attention",
        )(q, value, ref, spatial_shapes)

        slots = (queries * bev_mask).sum(axis=0, keepdims=True)
        slots = QDense(self.embed_dims, quant=self.quant, name="output_proj")(slots)
        return slots + inp_residual


class CustomMSDeformableAttention(nn.Module):
    """Decoder cross-attention: object queries sample the BEV plane
    (reference decoder.py:116-345). value_proj + output_proj + residual."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    quant: bool = False

    @nn.compact
    def __call__(
        self,
        query,             # [1, Nq, C]
        value,             # [1, num_keys, C]  (bev_embed)
        identity,
        query_pos,
        reference_points,  # [1, Nq, 1, 2]
        spatial_shapes: Tuple[Tuple[int, int], ...],
    ):
        inp_residual = query if identity is None else identity
        if query_pos is not None:
            query = query + query_pos
        C, H = self.embed_dims, self.num_heads
        nq = query.shape[1]
        L, P = self.num_levels, self.num_points

        v = QDense(C, quant=self.quant, name="value_proj")(value)
        v = v.reshape(1, -1, H, C // H)
        off = QDense(H * L * P * 2, quant=self.quant, name="sampling_offsets")(query)
        attn = QDense(H * L * P, quant=self.quant, name="attention_weights")(query)
        out = multi_scale_deformable_attn(
            v,
            reference_points.reshape(1, nq, 1, 2),
            off.reshape(1, nq, H, L * P * 2),
            attn.reshape(1, nq, H, L * P),
            spatial_shapes,
        )
        out = QDense(C, quant=self.quant, name="output_proj")(out)
        return out + inp_residual


class MultiheadAttention(nn.Module):
    """Decoder self-attention over object queries, built on the fused qkv op
    (reference multi_head_attention.py:110-255 wrapping the QKVTRT plugin)."""

    embed_dims: int = 256
    num_heads: int = 8
    quant: bool = False

    @nn.compact
    def __call__(self, query, key, value, identity, query_pos, key_pos):
        inp_residual = query if identity is None else identity
        if query_pos is not None:
            query = query + query_pos
        if key_pos is not None:
            key = key + key_pos
        C = self.embed_dims
        q = QDense(C, quant=self.quant, name="q_proj")(query)
        k = QDense(C, quant=self.quant, name="k_proj")(key)
        v = QDense(C, quant=self.quant, name="v_proj")(value)
        if self.quant:
            q = QDQ(name="qdq_q")(q)
            k = QDQ(name="qdq_k")(k)
            v = QDQ(name="qdq_v")(v)
        out = multi_head_attention(q, k, v, num_heads=self.num_heads)
        out = QDense(C, quant=self.quant, name="out_proj")(out)
        return out + inp_residual
