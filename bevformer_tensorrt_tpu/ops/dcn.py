"""Modulated deformable convolution (DCNv2).

TPU-native equivalent of the reference's ModulatedDeformableConv2dTRT plugin
(TensorRT/plugin/modulated_deformable_conv2d/modulatedDeformableConv2dKernel.cu:
bilinear im2col at offset positions x sigmoid mask (:260-318), then cuBLAS
GEMM (:702-760), then bias add (:551-608)).  Python contract:
det2trt/models/modules/cnn/dcn.py and mmcv's modulated_deform_conv.

Two execution paths:

* XLA (`_dcn_xla`, any backend, differentiable): a static loop over the
  kh*kw taps — each tap one corner-packed bilinear gather followed by a
  [Cout, Cin] x [Cin, N*Ho*Wo] MXU matmul.
* Pallas (TPU inference): the sorted-tap gather kernel
  (ops/pallas/msda_gather, emit_rows mode) produces the channel-major
  bilinear-im2col directly — tap rows of 128 consecutive output pixels
  sweep only the key panels they touch (output raster order makes taps
  panel-local), the kh*kw taps of one kernel row share one union sweep,
  and ONE [Cout, kh*kw*Cin] x [kh*kw*Cin, S] GEMM finishes.  This removes
  the XLA path's per-tap row-gather index cost (~40 M rows/s) that made
  DCN the backbone's dominant term.  Training still differentiates:
  `jax.custom_vjp` recomputes the backward through the XLA formulation.

Mask is the *already-sigmoided* modulation (the caller applies sigmoid, as
mmcv's wrapper does).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _dcn_xla(
    x, offset, mask, weight, stride, padding, dilation, groups, deform_groups
):
    N, Cin, H, W = x.shape
    Cout, Cin_g, kh, kw = weight.shape
    dg = deform_groups
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

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

    # corner packing (the MSDA trick, ops/msda corner rolls): the 4 bilinear
    # corners (k, k+1, k+W, k+W+1) are stacked on the channel axis so each
    # tap needs ONE gather instead of four — the gather is index-rate bound
    # on TPU.  Wrap-around rows from the rolls are always masked by the slot
    # weights (clamped-window remap in bilinear_slot_terms_pixels).
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
    return out


def _dcn_pallas(
    x, offset, mask, weight, stride, padding, dilation,
    packed=True, interpret=False, ch_group=None, layout="NCHW",
):
    """Sorted-gather im2col + single GEMM (requires groups=dg=1,
    Cin % ch_group == 0).

    ch_group (channels per table) defaults from the v5e sweep
    (/tmp round-2 probes, chained-call timing at c4 [6,256,58,100]):
    bf16 128 (3.4 ms vs 4.6 at 32 — fewer per-visit fixed costs), int8 64
    (1.75 ms — half the gathered sublanes again).  The reference's int8
    DCN plugin makes the same trade (TensorRT/README.md x5.1 dcn row).

    layout='NHWC' takes x [N,H,W,Cin] / offset [N,Ho,Wo,2*rows] /
    mask [N,Ho,Wo,rows] and returns [N,Ho,Wo,Cout]: the table packs
    channel-last words before the keys-minor transpose and the output
    GEMM emits pixels-major directly, removing both full-feature NHWC <->
    NCHW relayouts the backbone otherwise pays per DCN block.
    """
    from .msda import (
        _pack_tables_from_vt,
        _pack_tables_from_xlast,
        bilinear_slot_terms_pixels,
    )
    from .pallas.msda_gather import msda_gather_sorted

    interpret = interpret or jax.default_backend() != "tpu"
    nhwc = layout == "NHWC"
    if nhwc:
        N, H, W, Cin = x.shape
    else:
        N, Cin, H, W = x.shape
    Cout, _, kh, kw = weight.shape
    rows = kh * kw
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    S = Ho * Wo
    q_pad = (-S) % 128
    QB = (S + q_pad) // 128
    if ch_group is None:
        import os

        env = int(os.environ.get("DCN_CHG", "0"))  # A/B harness override
        want = env or (64 if packed == "int8" else 128)
        ch_group = want if Cin % want == 0 else 32
    G = Cin // ch_group
    B = N * G

    f32 = jnp.float32
    tdtype = jnp.bfloat16 if packed else jnp.float32
    if nhwc:
        xl = x.reshape(N, H * W, Cin).astype(tdtype)
        table, _, scale = _pack_tables_from_xlast(xl, ch_group, ((H, W),), packed)
        off = (
            offset.astype(f32).reshape(N, S, rows, 2).transpose(0, 2, 3, 1)
        )  # [N, rows, 2, S]
        msk = mask.astype(f32).reshape(N, S, rows).transpose(0, 2, 1)
    else:
        vt = x.reshape(B, ch_group, H * W).astype(tdtype)
        table, _, scale = _pack_tables_from_vt(vt, ((H, W),), packed)
        off = offset.astype(f32).reshape(N, rows, 2, S)
        msk = mask.astype(f32).reshape(N, rows, S)
    gy = (jnp.arange(Ho, dtype=f32)[:, None] * stride - padding)
    gx = (jnp.arange(Wo, dtype=f32)[None, :] * stride - padding)
    gy = jnp.broadcast_to(gy, (Ho, Wo)).reshape(1, 1, S)
    gx = jnp.broadcast_to(gx, (Ho, Wo)).reshape(1, 1, S)
    di = jnp.asarray(
        [(t // kw) * dilation for t in range(rows)], f32
    ).reshape(1, rows, 1)
    dj = jnp.asarray(
        [(t % kw) * dilation for t in range(rows)], f32
    ).reshape(1, rows, 1)
    py = gy + di + off[:, :, 0]
    px = gx + dj + off[:, :, 1]
    key, slots = bilinear_slot_terms_pixels(px, py, H, W)  # [N, rows, S]
    m4 = jnp.stack(slots, axis=2) * msk[:, :, None]        # [N, rows, 4, S]
    if q_pad:
        # replicate the last pixel's taps (keeps spans tight); their im2col
        # columns are sliced off after the GEMM
        key = jnp.pad(key, ((0, 0), (0, 0), (0, q_pad)), mode="edge")
        m4 = jnp.pad(m4, ((0, 0), (0, 0), (0, 0), (0, q_pad)))

    # lane/m4 stay query-minor ([N, rows, (4,) QB*128]) — the kernel's
    # BlockSpec slices 128-lane windows, so no relayout here
    qp = QB * 128

    # one kernel row (kw taps, same y) per union sweep: measured faster than
    # rg=1 at every ch_group — the taps' windows overlap by construction.
    # DCN_RG=9 unions ALL taps into one sweep per block: pays one per-group
    # fixed cost (the E-floor ~463 ns dominates at conv-like span~1) instead
    # of kh, at the price of a kh-row union span — A/B on hardware.
    import os as _os

    rg_env = int(_os.environ.get("DCN_RG", "0"))
    if rg_env and rows % rg_env == 0:
        rg = rg_env
    else:
        rg = kw if rows % kw == 0 else 1
        if rg_env:
            # a DCN_RG that doesn't divide rows is IGNORED (baked at trace
            # time) — warn so a hardware A/B can't silently measure the
            # default layout (ADVICE r4)
            import warnings

            warnings.warn(
                f"DCN_RG={rg_env} does not divide rows={rows}; using rg={rg}",
                stacklevel=2,
            )
    ng = rows // rg
    panel = key // 128
    pg = panel.reshape(N, ng, rg, QB, 128)
    pmin = pg.min(axis=(2, 4)).astype(jnp.int32).transpose(0, 2, 1)  # [N, QB, ng]
    pspan = (pg.max(axis=(2, 4)).astype(jnp.int32).transpose(0, 2, 1) - pmin + 1)
    pm = jnp.repeat(pmin.transpose(0, 2, 1), rg, axis=1)  # [N, rows, QB]
    pm = jnp.broadcast_to(pm[..., None], (N, rows, QB, 128)).reshape(N, rows, qp)
    lane = (key - pm * 128).astype(jnp.int32)

    mm_dtype = jnp.bfloat16 if packed else f32
    qbb = min(4, QB)
    im = msda_gather_sorted(
        table, lane, m4.astype(jnp.bfloat16 if packed else f32), pmin, pspan,
        rows=rows, ch=ch_group, corners=4, packed=packed, interpret=interpret,
        row_group=rg, emit_rows=True, tap_share=G, out_dtype=mm_dtype,
        q_blocks=qbb,  # emit_rows output blocks are rows*ch wide
        keep_pad=True,  # the GEMM consumes pad columns; [:, :S] slices the
        # small GEMM output instead of an 85 MB im2col copy here
    )  # [B, rows*chg, QBp*128]
    QBp = QB + (-QB) % qbb
    im = im.reshape(N, G, rows, ch_group, QBp * 128)
    if scale is not None:
        # int8 table dequant: out is linear in the table, so the per-(image,
        # channel-group) scale lands on the im2col rows
        im = im * scale.reshape(N, G)[:, :, None, None, None].astype(mm_dtype)
    wf = weight.astype(mm_dtype).reshape(Cout, G, ch_group, rows)
    if nhwc:
        out = jnp.einsum(
            "ogct,ngtcs->nso", wf, im, preferred_element_type=f32
        )[:, :S]
        return out.reshape(N, Ho, Wo, Cout)
    out = jnp.einsum(
        "ogct,ngtcs->nos", wf, im, preferred_element_type=f32
    )[:, :, :S]
    return out.reshape(N, Cout, Ho, Wo)


def _dcn_xla_layout(x, offset, mask, weight, stride, padding, dilation, groups, dg, layout):
    """_dcn_xla with optional NHWC in/out (the XLA path is the training /
    CPU fallback, so plain transposes are fine here)."""
    if layout == "NHWC":
        out = _dcn_xla(
            x.transpose(0, 3, 1, 2),
            offset.transpose(0, 3, 1, 2),
            mask.transpose(0, 3, 1, 2),
            weight, stride, padding, dilation, groups, dg,
        )
        return out.transpose(0, 2, 3, 1)
    return _dcn_xla(x, offset, mask, weight, stride, padding, dilation, groups, dg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _dcn_pallas_diff(x, offset, mask, weight, stride, padding, dilation, packed=True, layout="NCHW"):
    return _dcn_pallas(
        x, offset, mask, weight, stride, padding, dilation, packed=packed, layout=layout
    )


def _dcn_pallas_fwd(x, offset, mask, weight, stride, padding, dilation, packed=True, layout="NCHW"):
    out = _dcn_pallas(
        x, offset, mask, weight, stride, padding, dilation, packed=packed, layout=layout
    )
    return out, (x, offset, mask, weight)


def _dcn_pallas_bwd(stride, padding, dilation, packed, layout, res, g):
    x, offset, mask, weight = res
    _, vjp = jax.vjp(
        lambda *a: _dcn_xla_layout(*a, stride, padding, dilation, 1, 1, layout),
        x, offset, mask, weight,
    )
    return vjp(g.astype(jnp.float32))


_dcn_pallas_diff.defvjp(_dcn_pallas_fwd, _dcn_pallas_bwd)


@functools.partial(
    jax.jit,
    static_argnames=(
        "stride", "padding", "dilation", "groups", "deform_groups", "impl",
        "quant", "layout",
    ),
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
    impl: str = "auto",
    quant: bool | str = False,
    layout: str = "NCHW",
) -> jax.Array:
    """DCNv2 forward.

    Args:
      x: [N, Cin, H, W] (or [N, H, W, Cin] with layout='NHWC')
      offset: [N, 2*dg*kh*kw, Ho, Wo] — per tap (y, x) interleaved, mmcv layout
        (channel 2*t = y-offset of tap t, 2*t+1 = x-offset).  NHWC: same
        interleave on the last axis, [N, Ho, Wo, 2*dg*kh*kw].
      mask: [N, dg*kh*kw, Ho, Wo] (NHWC: [N, Ho, Wo, dg*kh*kw]), sigmoid
        already applied.
      weight: [Cout, Cin//groups, kh, kw]
      bias: [Cout] or None.
      impl: 'auto' (Pallas on TPU when eligible), 'pallas', or 'jnp'.
      quant: 'int8' packs the gather table int8 (quarter VMEM, half the
        gathered sublanes; ~1% rel err — the reference's int8 DCN plugin
        trade, TensorRT/README.md modulated-deform-conv x5.1 row).
      layout: 'NCHW' (mmcv contract) or 'NHWC' (TPU-native; skips both
        full-feature relayouts around the op — the backbone path).
    Returns:
      [N, Cout, Ho, Wo] (NHWC: [N, Ho, Wo, Cout])
    """
    if layout == "NHWC":
        N, H, W, Cin = x.shape
    else:
        N, Cin, H, W = x.shape
    Cout, Cin_g, kh, kw = weight.shape
    dg = deform_groups
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    if layout == "NHWC":
        assert offset.shape == (N, Ho, Wo, 2 * dg * kh * kw), offset.shape
        assert mask.shape == (N, Ho, Wo, dg * kh * kw), mask.shape
    else:
        assert offset.shape == (N, 2 * dg * kh * kw, Ho, Wo), offset.shape
        assert mask.shape == (N, dg * kh * kw, Ho, Wo), mask.shape

    eligible = groups == 1 and dg == 1 and Cin % 32 == 0
    use_pallas = impl == "pallas" or (
        impl == "auto" and eligible and jax.default_backend() == "tpu"
    )
    if use_pallas:
        out = _dcn_pallas_diff(
            x, offset, mask, weight, stride, padding, dilation,
            "int8" if quant == "int8" else True, layout,
        )
    else:
        out = _dcn_xla_layout(
            x, offset, mask, weight, stride, padding, dilation, groups, dg, layout
        )
    if bias is not None:
        b = bias.astype(out.dtype)
        out = out + (b[None, None, None, :] if layout == "NHWC" else b[None, :, None, None])
    return out.astype(x.dtype)
