"""Modulated deformable convolution (DCNv2).

TPU-native equivalent of the reference's ModulatedDeformableConv2dTRT plugin
(TensorRT/plugin/modulated_deformable_conv2d/modulatedDeformableConv2dKernel.cu:
bilinear im2col at offset positions x sigmoid mask (:260-318), then cuBLAS
GEMM (:702-760), then bias add (:551-608)).  Python contract:
det2trt/models/modules/cnn/dcn.py and mmcv's modulated_deform_conv.

TPU-first structure: the same im2col-then-GEMM decomposition, but organized
as a *static* loop over the kh*kw kernel taps — each tap is one bilinear
gather (VPU + gather unit) followed by one big [Cout, Cin] x [Cin, N*Ho*Wo]
matmul on the MXU.  9 large matmuls beat one huge im2col buffer: no
materialized [Cin*9, Ho*Wo] tensor in HBM, and XLA fuses the gather/blend
into the matmul's producer.

Mask is the *already-sigmoided* modulation (the caller applies sigmoid, as
mmcv's wrapper does).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("stride", "padding", "dilation", "groups", "deform_groups")
)
def modulated_deform_conv2d(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    groups: int = 1,
    deform_groups: int = 1,
) -> jax.Array:
    """DCNv2 forward.

    Args:
      x: [N, Cin, H, W]
      offset: [N, 2*dg*kh*kw, Ho, Wo] — per tap (y, x) interleaved, mmcv layout
        (channel 2*t = y-offset of tap t, 2*t+1 = x-offset).
      mask: [N, dg*kh*kw, Ho, Wo], sigmoid already applied.
      weight: [Cout, Cin//groups, kh, kw]
      bias: [Cout] or None.
    Returns:
      [N, Cout, Ho, Wo]
    """
    N, Cin, H, W = x.shape
    Cout, Cin_g, kh, kw = weight.shape
    dg = deform_groups
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    assert offset.shape == (N, 2 * dg * kh * kw, Ho, Wo), offset.shape
    assert mask.shape == (N, dg * kh * kw, Ho, Wo), mask.shape

    cdtype = jnp.float32
    # gather + blend stay in the input dtype (bf16 halves the gather
    # traffic; the reference's fp16 plugins make the same trade), while
    # sampling positions/weights remain f32 — bf16's 8 mantissa bits can't
    # address a 200-px map at sub-pixel precision.
    xf = x.reshape(N, dg, Cin // dg, H * W)
    offset = offset.astype(cdtype).reshape(N, dg, kh * kw, 2, Ho, Wo)
    mask = mask.astype(cdtype).reshape(N, dg, kh * kw, Ho, Wo)

    base_y = jnp.arange(Ho, dtype=cdtype)[:, None] * stride - padding  # [Ho, 1]
    base_x = jnp.arange(Wo, dtype=cdtype)[None, :] * stride - padding  # [1, Wo]

    # corner packing (the MSDA trick, ops/msda._corner_pack): the 4 bilinear
    # corners (k, k+1, k+W, k+W+1) are stacked on the channel axis so each
    # tap needs ONE gather instead of four — the gather is index-rate bound
    # on TPU, so this is ~4x on the sampling stage.  Wrap-around rows from
    # the rolls are always masked by the slot weights (clamped-window remap
    # in bilinear_slot_terms_pixels).
    from .msda import bilinear_slot_terms_pixels

    x4 = jnp.concatenate(
        [
            xf,
            jnp.roll(xf, -1, axis=3),
            jnp.roll(xf, -W, axis=3),
            jnp.roll(xf, -(W + 1), axis=3),
        ],
        axis=2,
    )  # [N, dg, 4*Cin/dg, H*W]

    def bilinear(py, px):
        """Sample at (py, px): [N, dg, Ho, Wo] -> [N, dg, Cin/dg, Ho, Wo]."""
        key, slots = bilinear_slot_terms_pixels(px, py, H, W)  # [N,dg,Ho,Wo]
        m4 = jnp.stack(slots, axis=-1)
        g = jnp.take_along_axis(
            x4, key.reshape(N, dg, 1, Ho * Wo), axis=3
        ).reshape(N, dg, 4, Cin // dg, Ho, Wo)
        m = m4.astype(cdtype).transpose(0, 1, 4, 2, 3)[:, :, :, None]  # [N,dg,4,1,Ho,Wo]
        return (g.astype(cdtype) * m).sum(axis=2)

    wf = weight.astype(cdtype)
    out = jnp.zeros((N, Cout, Ho, Wo), cdtype)
    for t in range(kh * kw):
        i, j = t // kw, t % kw
        py = base_y[None, None] + i * dilation + offset[:, :, t, 0]
        px = base_x[None, None] + j * dilation + offset[:, :, t, 1]
        sampled = bilinear(py, px) * mask[:, :, t][:, :, None]  # [N, dg, Cin/dg, Ho, Wo]
        sampled = sampled.reshape(N, groups, Cin // groups, Ho * Wo)
        wt = wf[:, :, i, j].reshape(groups, Cout // groups, Cin_g)
        out = out + jnp.einsum(
            "goc,ngcs->ngos", wt, sampled, preferred_element_type=cdtype
        ).reshape(N, Cout, Ho, Wo)

    if bias is not None:
        out = out + bias.astype(cdtype)[None, :, None, None]
    return out.astype(x.dtype)
