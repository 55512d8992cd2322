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

    def bilinear(py, px):
        """Sample xf at (py, px): [N, dg, Ho, Wo] -> [N, dg, Cin/dg, Ho, Wo]."""
        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        wy1 = py - y0
        wx1 = px - x0
        iy0 = y0.astype(jnp.int32)
        ix0 = x0.astype(jnp.int32)

        def corner(iy, ix, w):
            valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
            idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
            idx = idx.reshape(N, dg, 1, Ho * Wo)
            g = jnp.take_along_axis(xf, idx, axis=3).reshape(N, dg, Cin // dg, Ho, Wo)
            return g.astype(cdtype) * (w * valid.astype(cdtype))[:, :, None]

        return (
            corner(iy0, ix0, (1 - wy1) * (1 - wx1))
            + corner(iy0, ix0 + 1, (1 - wy1) * wx1)
            + corner(iy0 + 1, ix0, wy1 * (1 - wx1))
            + corner(iy0 + 1, ix0 + 1, wy1 * wx1)
        )

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
