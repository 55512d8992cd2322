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
import jax
import jax.numpy as jnp

from ...ops import (
    multi_head_attention,
    multi_scale_deformable_attn,
    multi_scale_deformable_attn_sorted_diff,
    multi_scale_deformable_attn_sorted_qm_diff,
)
from ...quant.policy import effective_quant
from ...quant.qdq import QDQ
from ..layers import QDense
import functools


def msda_impl_is_sorted(name: str) -> bool:
    return name in ("sorted", "sorted_f32") or (
        name == "auto" and jax.default_backend() == "tpu"
    )


def msda_packing(name: str, quant=False):
    """Table packing for the sorted kernel: int8-quad u32 words under
    quant='int8', f32 tables for 'sorted_f32' (exactness tests), bf16-pair
    u32 words otherwise (the production TPU path)."""
    if name == "sorted_f32":
        return False
    return "int8" if quant == "int8" else True


def resolve_msda_impl(name: str, quant=False):
    """Kernel-variant dispatch (the reference's TRT/TRTP/TRTP2 plugin-variant
    tier collapsed to one knob, configs/bevformer.py `msda_impl`):
      'jnp'        — chunked XLA path (differentiable; CPU/GPU/TPU)
      'sorted'     — Pallas sorted-tap gather kernel (ops/pallas/msda_gather)
      'sorted_f32' — same kernel with f32 tables (fp32-exact wiring tests)
      'auto'       — 'sorted' on TPU, 'jnp' elsewhere
    With quant == 'int8' the sorted kernel stores the value tables as
    int8-quad u32 words (the reference's int8 MSDA plugin tier,
    TensorRT/plugin/multi_scale_deformable_attn int8 path) — quarter the
    VMEM and half the gather rows of the bf16-pair packing.
    """
    if msda_impl_is_sorted(name):
        return functools.partial(
            multi_scale_deformable_attn_sorted_diff,
            packed=msda_packing(name, quant),
        )
    return multi_scale_deformable_attn


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
    msda_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        query,            # [1, Nq, C]
        value,            # [2, Ngrid, C] = [prev_bev, current bev] SAMPLING grid
        identity,         # [1, Nq, C]
        query_pos,        # [1, Nq, C]
        reference_points,  # [2, Nq, 1, 2] hybrid (shifted prev ref, ref)
        spatial_shapes: Tuple[Tuple[int, int], ...],  # ((bev_h, bev_w),)
        value_q=None,     # [2, Nq, C] query-ALIGNED history rows for the
                          # offset/weight concat; defaults to `value`.  The
                          # two roles coincide when Nq == Ngrid (sequential
                          # encoder); the pipeline-parallel encoder chunks
                          # the query axis, so its per-chunk rows differ
                          # from the full sampling grid (parallel/pp_encoder).
    ):
        C, H, L, P, Q = (
            self.embed_dims,
            self.num_heads,
            self.num_levels,
            self.num_points,
            self.num_bev_queue,
        )
        nq = query.shape[1]
        nq_v = value.shape[1]
        if value_q is None:
            value_q = value
        if query_pos is not None:
            query = query + query_pos

        if msda_impl_is_sorted(self.msda_impl):
            # q-minor dataflow (see MSDeformableAttention3D): projections
            # consume the q-MAJOR value/qcat directly and emit query-minor
            # (QDense q_minor='out' — the orientation folds into the
            # dot_general), so no transposed copy of value or qcat ever
            # materializes and the sorted op's internal relayouts disappear.
            packed = msda_packing(self.msda_impl, effective_quant(self.quant, self.path + ('msda_tables',)))
            v_t = QDense(C, quant=self.quant, name="value_proj")(
                value, q_minor="out"
            )  # [Q, C, nq_v]
            qcat = jnp.concatenate([value_q[0:1], query], axis=-1)  # [1, nq, 2C]
            off_t = QDense(
                Q * H * L * P * 2, quant=self.quant, name="sampling_offsets"
            )(qcat, q_minor="out")
            attn_t = QDense(
                Q * H * L * P, quant=self.quant, name="attention_weights"
            )(qcat, q_minor="out")
            # feature order (H, Q, L*P*2) -> queue folded into batch
            off_t = off_t.reshape(H, Q, L * P * 2, nq).transpose(1, 0, 2, 3)
            attn_t = attn_t.reshape(H, Q, L * P, nq).transpose(1, 0, 2, 3)
            ref_t = reference_points.reshape(Q, nq, 1, 2).transpose(0, 2, 3, 1)
            # debug surface: apply(..., mutable=['intermediates']) captures
            # the exact kernel operands (tools/msda_capture_repro.py); the
            # init guard keeps the big capture tuples out of init variables
            if not self.is_initializing():
                self.sow(
                    "intermediates", "msda_in",
                    (v_t, ref_t, off_t.reshape(Q, H * L * P * 2, nq),
                     attn_t.reshape(Q, H * L * P, nq)),
                )
            out = multi_scale_deformable_attn_sorted_qm_diff(
                v_t,
                ref_t,
                off_t.reshape(Q, H * L * P * 2, nq),
                attn_t.reshape(Q, H * L * P, nq),
                spatial_shapes,
                num_heads=H,
                packed=packed,
                out_dtype=query.dtype,
            )  # [Q, Nq, C] — q-minor output + q_minor='in' proj measured
            # SLOWER on v5e (482.5 vs 480.1 ms base; out_q_minor kept for A/B)
            out = out.mean(axis=0, keepdims=True)  # fuse history & current
            out = QDense(C, quant=self.quant, name="output_proj")(out)
            return out + (query if identity is None else identity)
        else:
            # concat prev-frame BEV with the (pos-augmented) query
            qcat = jnp.concatenate([value_q[0:1], query], axis=-1)  # [1, Nq, 2C]
            v = QDense(C, quant=self.quant, name="value_proj")(value)
            v = v.reshape(Q, nq_v, H, C // H)
            off = QDense(
                Q * H * L * P * 2, quant=self.quant, name="sampling_offsets"
            )(qcat)
            attn = QDense(
                Q * H * L * P, quant=self.quant, name="attention_weights"
            )(qcat)
            # [1, Nq, H, Q, L*P*2] -> queue folded into batch: [Q, Nq, H, *]
            off = off.reshape(nq, H, Q, L * P * 2).transpose(2, 0, 1, 3)
            attn = attn.reshape(nq, H, Q, L * P).transpose(2, 0, 1, 3)
            out = resolve_msda_impl(self.msda_impl, effective_quant(self.quant, self.path + ('msda_tables',)))(
                v, reference_points.reshape(Q, nq, 1, 2), off, attn,
                spatial_shapes,
            )  # [Q, Nq, C]
            out = out.mean(axis=0, keepdims=True)  # fuse history & current
            out = QDense(C, quant=self.quant, name="output_proj")(out)
            return out + (query if identity is None else identity)


class MSDeformableAttention3D(nn.Module):
    """Per-camera deformable attention over multi-level image features
    (reference spatial_cross_attention.py:277-768, TRTP path).  No output
    projection / residual — SpatialCrossAttention owns those.

    TPU-first restructure vs the reference: offsets/weights are computed
    ONCE from the BEV query (the reference broadcasts the same query to all
    cameras, so its per-camera projections are redundant), and a static
    per-camera query budget compacts the gather work to the queries each
    camera can actually see (top-K by bev_mask; unselected queries have
    mask 0 and contribute exactly 0 — the reference's dynamic `max_len`
    rebatching, spatial_cross_attention.py:201-231, with a static shape).
    """

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 8
    cam_budget: float = 0.5  # fraction of queries processed per camera
    quant: bool = False
    msda_impl: str = "auto"

    # Output orientation.  The machinery for a query-minor ([.., C, nq])
    # output + q_minor='in' output_proj exists, but q-major measured FASTER
    # here on v5e (489 vs 480 ms base bf16): the compaction scatter wants
    # row-major rows, and XLA folds the op-output relayout well.  The
    # temporal self-attention (no scatter) does keep its q-minor output.
    # A module-level constant (not config-dependent, and deliberately NOT an
    # annotated dataclass field) so the parent SpatialCrossAttention and this
    # module can never disagree on it.
    OUT_Q_MINOR = False

    def _out_q_minor(self) -> bool:
        return type(self).OUT_Q_MINOR

    @nn.compact
    def __call__(
        self,
        query,                 # [1, Nq, C]
        value,                 # [num_cams, num_keys, C]
        reference_points_cam,  # [num_cams, Nq, ppg*2]
        bev_mask,              # [num_cams, Nq, 1] normalized weights
        spatial_shapes: Tuple[Tuple[int, int], ...],
        compaction=None,       # optional (topi [cams,K], topv [cams,K], ref_c)
    ):
        C, H = self.embed_dims, self.num_heads
        cams, nq = reference_points_cam.shape[:2]
        L, P = self.num_levels, self.num_points
        ppg = reference_points_cam.shape[-1] // 2

        K = min(nq, max(128, -(-int(nq * self.cam_budget) // 128) * 128))
        # the sorted kernel NEEDS the compaction path even at K == nq: its
        # sigma ordering (sort by projected image position) is what keeps
        # each 128-tap row panel-local — raster-ordered BEV queries sweep
        # the whole image per row (measured 10.5 s/frame at tiny,
        # cam_budget=1.0).  At K == nq it is a pure permutation: nothing
        # can be dropped, so exactness is unconditional.
        if K < nq or msda_impl_is_sorted(self.msda_impl):
            if compaction is not None:
                topi, topv, ref_c = compaction
            else:
                mask_flat = bev_mask.reshape(cams, nq)
                topv, topi = jax.lax.top_k(mask_flat, K)  # [cams, K]
                ref_c = jnp.take_along_axis(
                    reference_points_cam, topi[..., None], axis=1
                ).reshape(cams, K, 1, -1)
                # invisible selections: pin outside the image (weight 0,
                # border key) so kernel rows stay panel-local (see encoder)
                ref_c = jnp.where((topv > 0).reshape(cams, K, 1, 1), ref_c, 2.0)

            if msda_impl_is_sorted(self.msda_impl):
                # q-minor dataflow: the per-camera compacted query gather is
                # the ONLY data movement — value_proj and the offset/weight
                # projections consume q-MAJOR inputs and emit query-minor
                # (QDense q_minor='out', orientation folded into the
                # dot_general), so none of the q-major path's large
                # gathers/relayouts (off[topi], attn[topi], value/query
                # transposes) materialize.
                packed = msda_packing(self.msda_impl, effective_quant(self.quant, self.path + ('msda_tables',)))
                v_t = QDense(C, quant=self.quant, name="value_proj")(
                    value, q_minor="out"
                )  # [cams, C, keys]
                q_c = query[0][topi]                 # [cams, K, C]
                off_t = QDense(
                    H * L * P * 2, quant=self.quant, name="sampling_offsets"
                )(q_c, q_minor="out")                # [cams, H*L*P*2, K]
                attn_t = QDense(
                    H * L * P, quant=self.quant, name="attention_weights"
                )(q_c, q_minor="out")                # [cams, H*L*P, K]
                ref_t = ref_c.reshape(cams, K, ppg, 2).transpose(0, 2, 3, 1)
                if not self.is_initializing():
                    self.sow(
                        "intermediates", "msda_in", (v_t, ref_t, off_t, attn_t)
                    )
                out_k = multi_scale_deformable_attn_sorted_qm_diff(
                    v_t, ref_t, off_t, attn_t, spatial_shapes, num_heads=H,
                    packed=packed, out_dtype=query.dtype,
                )  # [cams, K, C]
                # q-major row scatter (measured: a q-minor per-camera
                # minor-axis scatter is SLOWER on v5e than this single
                # row scatter + the op's output relayout)
                weighted = (out_k * topv[..., None]).astype(out_k.dtype)
                slots = (
                    jnp.zeros((nq, C), out_k.dtype)
                    .at[topi.reshape(-1)]
                    .add(weighted.reshape(-1, C), mode="drop")
                )
                return slots[None].swapaxes(-1, -2) if self._out_q_minor() else slots[None]
            else:
                v = QDense(C, quant=self.quant, name="value_proj")(value)
                v = v.reshape(cams, -1, H, C // H)
                off = QDense(
                    H * L * P * 2, quant=self.quant, name="sampling_offsets"
                )(query)
                attn = QDense(
                    H * L * P, quant=self.quant, name="attention_weights"
                )(query)
                off_c = off.reshape(nq, H, L * P * 2)[topi]
                attn_c = attn.reshape(nq, H, L * P)[topi]
                out_k = resolve_msda_impl(self.msda_impl, effective_quant(self.quant, self.path + ('msda_tables',)))(
                    v, ref_c, off_c, attn_c, spatial_shapes
                )  # [cams, K, C]
            weighted = (out_k * topv[..., None]).astype(out_k.dtype)
            slots = (
                jnp.zeros((nq, C), out_k.dtype)
                .at[topi.reshape(-1)]
                .add(weighted.reshape(-1, C), mode="drop")
            )
            return slots[None].swapaxes(-1, -2) if self._out_q_minor() else slots[None]

        v = QDense(C, quant=self.quant, name="value_proj")(value)
        v = v.reshape(cams, -1, H, C // H)
        off = QDense(H * L * P * 2, quant=self.quant, name="sampling_offsets")(query)
        attn = QDense(H * L * P, quant=self.quant, name="attention_weights")(query)
        off = off.reshape(nq, H, L * P * 2)
        attn = attn.reshape(nq, H, L * P)
        ref = reference_points_cam.reshape(cams, nq, 1, -1)
        out = resolve_msda_impl(self.msda_impl, effective_quant(self.quant, self.path + ('msda_tables',)))(
            v,
            ref,
            jnp.broadcast_to(off[None], (cams, nq, H, L * P * 2)),
            jnp.broadcast_to(attn[None], (cams, nq, H, L * P)),
            spatial_shapes,
        )
        out = (out * bev_mask).sum(axis=0, keepdims=True)
        return out.swapaxes(-1, -2) if self._out_q_minor() else out


class SpatialCrossAttention(nn.Module):
    """Camera-folded spatial cross-attention (reference
    spatial_cross_attention.py:181-273, TRTP path): per-camera MSDA3D
    combined with the normalized bev_mask weights (hit-count normalization
    folded into the mask by the encoder's point_sampling —
    encoder.py:256-258)."""

    embed_dims: int = 256
    num_cams: int = 6
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 8
    cam_budget: float = 0.5
    quant: bool = False
    msda_impl: str = "auto"

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
        compaction=None,
    ):
        inp_residual = query if identity is None else identity
        if query_pos is not None:
            query = query + query_pos

        slots = MSDeformableAttention3D(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_levels=self.num_levels,
            num_points=self.num_points,
            cam_budget=self.cam_budget,
            quant=self.quant,
            msda_impl=self.msda_impl,
            name="deformable_attention",
        )(
            query, value, reference_points_cam, bev_mask, spatial_shapes,
            compaction,
        )

        # orientation follows the child's (q-minor machinery kept for A/B;
        # MSDeformableAttention3D.OUT_Q_MINOR currently pins q-major)
        qmin = MSDeformableAttention3D.OUT_Q_MINOR
        slots = QDense(self.embed_dims, quant=self.quant, name="output_proj")(
            slots, q_minor="in" if qmin else False
        )
        return slots + inp_residual


class CustomMSDeformableAttention(nn.Module):
    """Decoder cross-attention: object queries sample the BEV plane
    (reference decoder.py:116-345). value_proj + output_proj + residual."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    quant: bool = False
    msda_impl: str = "auto"

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
        # static dispatch: the sorted kernel streams/packs the whole BEV
        # value table per call — built for the encoder's 40k-query loads.
        # The decoder gathers only nq*H*L*P*4 corners (900 queries -> ~115k
        # rows vs a 40k-key table): when that's under the table size the
        # chunked XLA gather path wins (trace 2026-08-19: 6 x ~2.9 ms sorted
        # vs ~0.3 ms est. jnp).  MSDA_DECODER_IMPL overrides for A/B.
        import os

        nk = v.shape[1]
        impl = os.environ.get("MSDA_DECODER_IMPL", "")
        if not impl:
            impl = "jnp" if nq * H * L * P * 4 < nk * H else self.msda_impl
        out = resolve_msda_impl(impl, effective_quant(self.quant, self.path + ('msda_tables',)))(
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
    (reference multi_head_attention.py:110-255 wrapping the QKVTRT plugin).

    On TPU with eligible head dims the Pallas flash-attention kernel is
    selected — the analogue of the reference's flash-MHA eligibility check
    (multiHeadAttnPlugin.h:86-91: head_dim in {32, 64})."""

    embed_dims: int = 256
    num_heads: int = 8
    quant: bool | str = False

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
        head_dim = C // self.num_heads
        use_flash = jax.default_backend() == "tpu" and head_dim in (32, 64)
        int8_flash = use_flash and effective_quant(self.quant, self.path + ('flash',)) == "int8"
        if self.quant and not int8_flash:
            # int8 flash quantizes q/k/v itself (dynamic per-tensor scales);
            # a fake-quant pass before it would just double-round
            q = QDQ(name="qdq_q")(q)
            k = QDQ(name="qdq_k")(k)
            v = QDQ(name="qdq_v")(v)
        if use_flash:
            from ...ops.attention import (
                flash_attention_diff,
                flash_attention_int8_diff,
            )

            # int8 flash MHA under quant='int8' — the reference's x8.2 int8
            # flash plugin tier (multiHeadFlashAttnKernel.cu int8 path).
            # The _diff wrappers add an XLA backward (custom_vjp) so
            # jax.grad works through the decoder on TPU.
            impl = flash_attention_int8_diff if int8_flash else flash_attention_diff
        else:
            from ...ops.attention import qkv

            impl = qkv
        out = multi_head_attention(q, k, v, num_heads=self.num_heads, impl=impl)
        out = QDense(C, quant=self.quant, name="out_proj")(out)
        return out + inp_residual
