"""Shared building-block layers with optional quantization sites.

Mirrors the reference's registry-swapped layer families
(det2trt/models/utils/register.py LINEAR_LAYERS {Linear, LinearQ} /
CONV_LAYERS {Conv2dQ}): every QDense/QConv carries an activation QDQ site
and a per-channel weight fake-quant site, both inert unless the caller
enables `quant` (config) and supplies/collects the matching variable
collections (see quant/qdq.py for the mode rules).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..quant.fake_quant import fake_quant, per_channel_scale
from ..quant.policy import effective_quant
from ..quant.qdq import QDQ


class WeightFakeQuant(nn.Module):
    """Per-output-channel weight fake-quant (scale derived from the weight
    itself, like pytorch-quantization's per-channel max weight quantizers
    which are always enabled on Q-layers).  Constructed only when the layer
    has quant sites, so plain-fp models never see it."""

    channel_axis: int = -1

    @nn.compact
    def __call__(self, w):
        if self.is_initializing():
            return w
        axis = self.channel_axis % w.ndim
        return fake_quant(w, per_channel_scale(w, axis=axis))


def _check_int8_scale_fn(mod, s_in, quant):
    """quant='int8' with no calibrated activation scale would silently
    degrade to fake-quant (a deploy misconfiguration quietly running fp);
    fail at trace time instead — unless this is an init or calibration
    pass, where scales legitimately don't exist yet."""
    if (
        quant == "int8"
        and s_in is None
        and not mod.is_initializing()
        and not mod.is_mutable_collection("amax_stats")
        and not mod.is_mutable_collection("hist_stats")
    ):
        raise ValueError(
            f"{mod.__class__.__name__} '{mod.name}': quant='int8' requires "
            "calibrated activation scales (the 'quant' collection); run the "
            "calibration tool first, or use quant=True for fake-quant."
        )


class QDense(nn.Module):
    """Dense with quantization sites.

    quant (shared convention for all Q-layers):
      False  — plain fp layer.
      True   — QDQ fake-quant sites (PTQ-sim & QAT; reference's
               pytorch-quantization semantics).
      'int8' — REAL int8 execution: activation quantized with the calibrated
               per-tensor scale, weight per-channel int8, MXU int8 matmul
               accumulating int32, fused dequant (the reference plugins'
               INT8 path, e.g. multiScaleDeformableAttnKernel.cu:849-956).
               Requires the "quant" collection (calibration scales);
               raises at trace time when absent outside init/calibration.
    """

    features: int
    use_bias: bool = True
    quant: bool | str = False
    dtype: Optional[jnp.dtype] = None
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, q_minor: bool | str = False):
        """q_minor=True contracts the SECOND-minor axis of x and emits the
        output features second-minor: x [..., f_in, q] -> y [..., f_out, q].
        The feature axis becomes part of the matmul instead of a separate
        relayout — on TPU, producing attention offsets/weights/values in the
        kernel-friendly query-minor layout this way is free, while
        transposing the q-major dense output costs a full HBM round trip.
        q_minor='out' takes q-MAJOR input and emits q-minor output
        (x [..., q, f_in] -> y [..., f_out, q]): one dot_general, so callers
        skip materializing the transposed INPUT too (the temporal/cross
        attention value and query-cat tensors).  q_minor='in' is the
        inverse: q-MINOR input, q-MAJOR output (x [..., f_in, q] ->
        y [..., q, f_out]) — consumes a kernel's query-minor output without
        a relayout (the sorted MSDA op's output_proj).  Parameters are
        identical in all orientations (kernel [f_in, f_out]).
        """
        quant = effective_quant(self.quant, self.path)
        f_in = x.shape[-1] if q_minor == "out" else (
            x.shape[-2] if q_minor else x.shape[-1]
        )
        qm_out = q_minor in (True, "out")  # output orientation is q-minor
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (f_in, self.features), jnp.float32
        )

        def mm(xv, kv, **kw):
            if q_minor == "out":
                return jnp.einsum("fo,...qf->...oq", kv, xv, **kw)
            if q_minor == "in":
                return jnp.einsum("fo,...fq->...qo", kv, xv, **kw)
            if q_minor:
                return jnp.einsum("fo,...fq->...oq", kv, xv, **kw)
            return jax.lax.dot_general(
                xv, kv, (((xv.ndim - 1,), (0,)), ((), ())), **kw
            )

        def badd(y, bias):
            return y + (bias[:, None] if qm_out else bias)

        if quant:
            x_scaled, s_in = QDQ(name="qdq_in", with_scale=True)(x)
            _check_int8_scale_fn(self, s_in, quant)
            if quant == "int8" and s_in is not None:
                # real int8 path: quantize with the calibrated scale
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in), -127, 127).astype(jnp.int8)
                if self.has_variable("quant", "wq"):
                    # deploy: folded int8 weights (quant/fold.py) — no
                    # per-forward re-quantization of the fp kernel
                    wq = self.get_variable("quant", "wq")
                    w_scale = self.get_variable("quant", "wscale")
                else:
                    w_scale = jnp.max(jnp.abs(kernel), axis=0) / 127.0 + 1e-12
                    wq = jnp.clip(
                        jnp.round(kernel / w_scale[None, :]), -127, 127
                    ).astype(jnp.int8)
                acc = mm(xq, wq, preferred_element_type=jnp.int32)
                y = acc.astype(jnp.float32) * (
                    s_in * (w_scale[:, None] if qm_out else w_scale)
                )
                if self.use_bias:
                    bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
                    y = badd(y, bias)
                return y.astype(x.dtype)
            x = x_scaled
            kernel = WeightFakeQuant(channel_axis=1, name="wq")(kernel)
        dtype = self.dtype or x.dtype
        y = mm(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = badd(y, bias.astype(dtype))
        return y


class QConv(nn.Module):
    """Conv with quantization sites; `quant` convention as QDense."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: str | int | Tuple = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    quant: bool | str = False
    dtype: Optional[jnp.dtype] = None
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        """x: NHWC."""
        quant = effective_quant(self.quant, self.path)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1] // self.feature_group_count, self.features),
            jnp.float32,
        )
        if quant:
            x_scaled, s_in = QDQ(name="qdq_in", with_scale=True)(x)
            _check_int8_scale_fn(self, s_in, quant)
            if quant == "int8" and s_in is not None:
                # real int8 conv: MXU int8 with int32 accumulate
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in), -127, 127).astype(jnp.int8)
                if self.has_variable("quant", "wq"):
                    wq = self.get_variable("quant", "wq")
                    w_scale = self.get_variable("quant", "wscale")
                else:
                    w_scale = (
                        jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0 + 1e-12
                    )
                    wq = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)
                acc = jax.lax.conv_general_dilated(
                    xq,
                    wq,
                    window_strides=self.strides,
                    padding=pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=self.feature_group_count,
                    preferred_element_type=jnp.int32,
                )
                y = acc.astype(jnp.float32) * (s_in * w_scale)
                if self.use_bias:
                    bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
                    y = y + bias
                return y.astype(x.dtype)
            x = x_scaled
            kernel = WeightFakeQuant(channel_axis=3, name="wq")(kernel)
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=self.strides,
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class FFN(nn.Module):
    """Two-fc feed-forward block with residual add (reference FFNTRT,
    det2trt/models/modules/feedforward_network.py:20-68)."""

    embed_dims: int
    feedforward_channels: int
    quant: bool = False

    @nn.compact
    def __call__(self, x, identity=None):
        out = QDense(self.feedforward_channels, quant=self.quant, name="fc1")(x)
        out = nn.relu(out)
        out = QDense(self.embed_dims, quant=self.quant, name="fc2")(out)
        return (x if identity is None else identity) + out


class LearnedPositionalEncoding(nn.Module):
    """Row/col learned positional embeddings (mmdet LearnedPositionalEncoding;
    reference config configs/bevformer/bevformer_base.py:174-178).
    Returns [bs, H, W, 2*num_feats]."""

    num_feats: int
    row_num_embed: int
    col_num_embed: int

    @nn.compact
    def __call__(self, bs: int):
        row = self.param(
            "row_embed", nn.initializers.uniform(1.0), (self.row_num_embed, self.num_feats)
        )
        col = self.param(
            "col_embed", nn.initializers.uniform(1.0), (self.col_num_embed, self.num_feats)
        )
        H, W = self.row_num_embed, self.col_num_embed
        x = jnp.broadcast_to(col[None, :, :], (H, W, self.num_feats))
        y = jnp.broadcast_to(row[:, None, :], (H, W, self.num_feats))
        pos = jnp.concatenate([x, y], axis=-1)
        return jnp.broadcast_to(pos[None], (bs, H, W, 2 * self.num_feats))


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)
