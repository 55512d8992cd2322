"""BEVFormer encoder: reference-point generation, lidar->image point
sampling, and the self/cross attention layer stack.

TPU-native re-design of the reference encoder
(det2trt/models/modules/encoder.py, TRTP variants :165-334 and
BEVFormerLayerTRTP :503-636).  Reference points are compile-time constants
(functions of the static BEV grid), point sampling is a batched 4x4 matmul
on the VPU, and the per-layer `use_prev_bev` mux is a lax.select-style
arithmetic blend exactly like the reference's
`use_prev_bev * prev_bev + (1 - use_prev_bev) * stack([q, q])`
(encoder.py:587-589) — no data-dependent branching, so one compiled graph
covers both the first frame of a scene and the steady state.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...configs.bevformer import BEVFormerConfig
from ...parallel.ops import shard_bev_queries
from ..layers import FFN
from .attention import SpatialCrossAttention, TemporalSelfAttention


def get_reference_points_3d(
    bev_h: int, bev_w: int, num_points_in_pillar: int
) -> np.ndarray:
    """Pillar reference points, normalized [0,1]: [1, pillar, h*w, 3]
    (reference encoder.py:169-195)."""
    Z = num_points_in_pillar
    zs = (np.linspace(0.5, Z - 0.5, Z) / Z)[:, None, None]
    xs = (np.linspace(0.5, bev_w - 0.5, bev_w) / bev_w)[None, None, :]
    ys = (np.linspace(0.5, bev_h - 0.5, bev_h) / bev_h)[None, :, None]
    zs, xs, ys = np.broadcast_arrays(zs, xs, ys)
    ref = np.stack([xs, ys, zs], axis=-1).reshape(1, Z, bev_h * bev_w, 3)
    return ref.astype(np.float32)


def point_sampling(
    ref_3d: jnp.ndarray,
    pc_range: Tuple[float, ...],
    lidar2img: jnp.ndarray,
    image_shape: Tuple[int, int],
    num_cams: int,
):
    """Project pillar reference points into each camera.

    Mirrors encoder.py:197-259 (TRTP point_sampling_trt): returns
      reference_points_cam [num_cams, nq, pillar*2] normalized image coords,
      bev_mask [num_cams, nq, 1] — per-camera hit weights normalized so the
      per-query sum over cameras is <= 1 (the soft "1 - prod(1 - hit)" form).
    """
    pillar, nq = ref_3d.shape[1], ref_3d.shape[2]
    span = jnp.asarray(
        [pc_range[3] - pc_range[0], pc_range[4] - pc_range[1], pc_range[5] - pc_range[2]],
        jnp.float32,
    )
    base = jnp.asarray(pc_range[:3], jnp.float32)
    pts = ref_3d.astype(jnp.float32) * span + base  # [1, pillar, nq, 3]
    pts = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)

    # [pillar, nq, 4] x [cams, 4, 4] -> [pillar, cams, nq, 4]
    l2i = lidar2img.reshape(num_cams, 4, 4).astype(jnp.float32)
    cam = jnp.einsum("pqd,ced->pcqe", pts[0], l2i)

    eps = 1e-5
    z = cam[..., 2:3]
    hit = (z > eps).astype(jnp.float32)
    xy = cam[..., 0:2] / jnp.maximum(z, eps)
    xy = xy / jnp.asarray([image_shape[1], image_shape[0]], jnp.float32)

    inb = (
        hit
        * (xy[..., 1:2] > 0.0)
        * (xy[..., 1:2] < 1.0)
        * (xy[..., 0:1] > 0.0)
        * (xy[..., 0:1] < 1.0)
    )  # [pillar, cams, nq, 1]

    # reference layout: permute(2,1,3,0,4) -> [cams, 1, nq, pillar, 2]
    ref_cam = xy.transpose(1, 2, 0, 3).reshape(num_cams, nq, pillar * 2)

    mask = 1.0 - jnp.prod(1.0 - inb, axis=0)  # any pillar point visible
    mask = mask.reshape(num_cams, nq, 1)
    mask = mask / jnp.clip(mask.sum(axis=0, keepdims=True), 1e-4, None)
    return ref_cam, mask


def cam_budget_overflow(cfg, lidar2img: np.ndarray) -> Tuple[np.ndarray, int]:
    """Host-side (numpy) guard for the static camera compaction.

    The encoder's per-camera top-K compaction silently drops visible BEV
    queries if a camera sees more than K = ceil(cam_budget*nq/128)*128 of
    them (the reference instead rebatches to the DYNAMIC per-frame max,
    spatial_cross_attention.py:72 `max_len`).  This mirrors point_sampling
    in numpy — no device dispatch — and returns (visible counts per camera,
    max overflow beyond K).  Engines call it per scene and warn on overflow.
    """
    nq = cfg.bev_h * cfg.bev_w
    K = min(nq, max(128, -(-int(nq * cfg.cam_budget) // 128) * 128))
    ref = get_reference_points_3d(cfg.bev_h, cfg.bev_w, cfg.num_points_in_pillar)[0]
    span = np.array(
        [cfg.pc_range[3] - cfg.pc_range[0],
         cfg.pc_range[4] - cfg.pc_range[1],
         cfg.pc_range[5] - cfg.pc_range[2]], np.float32,
    )
    pts = ref * span + np.asarray(cfg.pc_range[:3], np.float32)  # [pillar, nq, 3]
    pts = np.concatenate([pts, np.ones_like(pts[..., :1])], axis=-1)
    l2i = np.asarray(lidar2img, np.float32).reshape(cfg.num_cams, 4, 4)
    cam = np.einsum("pqd,ced->pcqe", pts, l2i)
    eps = 1e-5
    z = cam[..., 2]
    xy = cam[..., 0:2] / np.maximum(z, eps)[..., None]
    u = xy[..., 0] / cfg.img_w
    v = xy[..., 1] / cfg.img_h
    inb = (z > eps) & (u > 0) & (u < 1) & (v > 0) & (v < 1)  # [pillar, cams, nq]
    visible = inb.any(axis=0).sum(axis=1)  # [cams]
    return visible, int(max(0, visible.max() - K))


def encoder_geometry(cfg, lidar2img, shift, use_prev_bev, spatial_shapes):
    """Frame geometry shared by every encoder layer: hybrid 2D reference
    points, per-camera 3D projections + visibility, and the camera
    compaction (top-K + sigma sort).  Factored out of BEVFormerEncoder so
    the pipeline-parallel path (parallel/pp_encoder.py) consumes the EXACT
    same construction.  Returns (hybrid_ref_2d [2, nq, 1, 2],
    reference_points_cam [cams, nq, pillar*2], bev_mask [cams, nq, 1],
    compaction or None)."""
    nq = cfg.bev_h * cfg.bev_w

    ref_3d = jnp.asarray(
        get_reference_points_3d(cfg.bev_h, cfg.bev_w, cfg.num_points_in_pillar)
    )
    ref_2d = ref_3d[0, 0, :, :2].reshape(1, nq, 1, 2)

    reference_points_cam, bev_mask = point_sampling(
        ref_3d, cfg.pc_range, lidar2img, (cfg.img_h, cfg.img_w), cfg.num_cams
    )

    shift_ref_2d = ref_2d + shift.reshape(1, 1, 1, 2) * use_prev_bev
    hybrid_ref_2d = jnp.concatenate([shift_ref_2d, ref_2d], axis=0)  # [2, nq, 1, 2]

    # camera compaction is frame geometry — compute the per-camera top-K
    # ONCE and share it across every layer's cross-attention.
    from .attention import msda_impl_is_sorted

    compaction = None
    K = min(nq, max(128, -(-int(nq * cfg.cam_budget) // 128) * 128))
    # sorted impl: compute the compaction even at K == nq (pure
    # permutation) — the sigma sort is what makes the kernel fast
    if K < nq or msda_impl_is_sorted(cfg.msda_impl):
        mask_flat = bev_mask.reshape(cfg.num_cams, nq)
        topv, topi = jax.lax.top_k(mask_flat, K)
        # sigma ordering: sort each camera's selected queries by the
        # projected image position (row-major pixel key at the finest
        # level) of the middle z-anchor — the sorted-tap MSDA kernel's
        # 128-tap rows then cluster in few key panels.  Semantically
        # free: the output scatter at `topi` un-permutes.  Invisible
        # selections (mask 0) sort to the end.
        H0, W0 = spatial_shapes[0]
        ref_all = jnp.take_along_axis(
            reference_points_cam, topi[..., None], axis=1
        )  # [cams, K, pillar*2] — per query (x, y) per z-anchor
        zmid = cfg.num_points_in_pillar // 2
        u = ref_all[..., 2 * zmid]
        v = ref_all[..., 2 * zmid + 1]
        skey = jnp.clip(jnp.floor(v * H0), 0, H0 - 1) * W0 + jnp.clip(
            jnp.floor(u * W0), 0, W0 - 1
        )
        skey = jnp.where(topv > 0, skey, jnp.float32(H0 * W0 + 1))
        order = jnp.argsort(skey, axis=1)
        topi = jnp.take_along_axis(topi, order, axis=1)
        topv = jnp.take_along_axis(topv, order, axis=1)
        ref_c = jnp.take_along_axis(
            reference_points_cam, topi[..., None], axis=1
        ).reshape(cfg.num_cams, K, 1, -1)
        # invisible selections (mask weight 0) carry garbage projected
        # coordinates — pin them just outside the image (2.0): bilinear
        # weights become exactly 0 and their keys clamp to one border
        # panel, so the sorted-tap kernel's tail rows stay span-1
        # instead of sweeping panels wherever the garbage lands.
        ref_c = jnp.where(
            (topv > 0).reshape(cfg.num_cams, K, 1, 1), ref_c, 2.0
        )
        compaction = (topi, topv, ref_c)
    return hybrid_ref_2d, reference_points_cam, bev_mask, compaction


class BEVFormerLayer(nn.Module):
    """self_attn -> norm -> cross_attn -> norm -> ffn -> norm
    (operation_order, configs/bevformer/bevformer_base.py:114-121)."""

    cfg: BEVFormerConfig

    @nn.compact
    def __call__(
        self,
        query,                 # [1, nq, C]
        value,                 # [cams, keys, C]
        bev_pos,               # [1, nq, C]
        hybrid_ref_2d,         # [2, nq, 1, 2]
        reference_points_cam,  # [cams, nq, pillar*2]
        bev_mask,              # [cams, nq, 1]
        spatial_shapes: Tuple[Tuple[int, int], ...],
        prev_bev,              # [2, nq, C] (already muxed with use_prev_bev)
        compaction=None,       # frame-invariant (topi, topv, ref_c)
        prev_q=None,           # [2, chunk, C] query-aligned history rows when
                               # `query` is a CHUNK of the BEV grid (the
                               # pipeline-parallel encoder) — None means
                               # query grid == sampling grid (sequential)
    ):
        cfg = self.cfg
        identity = query
        # flax LayerNorm promotes bf16 x f32 params to f32 and would leave
        # the whole query path (and every QDense matmul on it) running f32;
        # keep f32 statistics but return the compute dtype.
        dt = query.dtype

        query = TemporalSelfAttention(
            embed_dims=cfg.embed_dims,
            num_heads=cfg.num_heads,
            num_points=cfg.num_points_self,
            quant=cfg.quant,
            msda_impl=cfg.msda_impl,
            name="self_attn",
        )(
            query,
            prev_bev,
            identity,
            bev_pos,
            hybrid_ref_2d,
            ((cfg.bev_h, cfg.bev_w),),
            prev_q,
        )
        query = nn.LayerNorm(epsilon=1e-5, name="norm1")(query).astype(dt)
        identity = query

        query = SpatialCrossAttention(
            embed_dims=cfg.embed_dims,
            num_cams=cfg.num_cams,
            num_heads=cfg.num_heads,
            num_levels=cfg.num_levels,
            num_points=cfg.num_points_cross,
            cam_budget=cfg.cam_budget,
            quant=cfg.quant,
            msda_impl=cfg.msda_impl,
            name="cross_attn",
        )(
            query,
            value,
            identity,
            None,  # query_pos: reference passes query_pos=None to cross attn
            reference_points_cam,
            bev_mask,
            spatial_shapes,
            compaction,
        )
        query = nn.LayerNorm(epsilon=1e-5, name="norm2")(query).astype(dt)
        query = FFN(cfg.embed_dims, cfg.ffn_dims, quant=cfg.quant, name="ffn")(query)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(query).astype(dt)


class BEVFormerEncoder(nn.Module):
    """Layer stack + geometry (reference encoder.py:165-334)."""

    cfg: BEVFormerConfig

    @nn.compact
    def __call__(
        self,
        bev_query,   # [1, nq, C]
        value,       # [cams, keys, C]
        bev_pos,     # [1, nq, C]
        lidar2img,   # [1, cams, 4, 4]
        prev_bev,    # [1, nq, C] (rotated by the transformer)
        shift,       # [2]
        use_prev_bev,  # [] scalar 0/1
        spatial_shapes: Tuple[Tuple[int, int], ...],
    ):
        cfg = self.cfg
        hybrid_ref_2d, reference_points_cam, bev_mask, compaction = (
            encoder_geometry(cfg, lidar2img, shift, use_prev_bev, spatial_shapes)
        )
        prev_queue = jnp.concatenate([prev_bev, bev_query], axis=0)  # [2, nq, C]

        # sequence parallelism over the BEV-query axis (SURVEY §2.6 TPU-native
        # column): under an ambient mesh the 40k-query tensors split over tp;
        # identity with no mesh (single chip, CPU tests).
        output = shard_bev_queries(bev_query)
        bev_pos = shard_bev_queries(bev_pos)
        for i in range(cfg.encoder_layers):
            # first-frame mux (encoder.py:587-589): when use_prev_bev == 0 the
            # history slot is replaced by the current query.
            cur_stack = jnp.concatenate([output, output], axis=0)
            mux = use_prev_bev.astype(output.dtype)
            layer_prev = mux * prev_queue.astype(output.dtype) + (1 - mux) * cur_stack
            output = BEVFormerLayer(cfg, name=f"layer{i}")(
                output,
                value,
                bev_pos,
                hybrid_ref_2d,
                reference_points_cam,
                bev_mask,
                spatial_shapes,
                layer_prev,
                compaction,
            )
            output = shard_bev_queries(output)
        return output
