"""Golden tests for rotate, bev_pool_v2, qkv, dcn, inverse (torch oracles)."""
import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from bevformer_tensorrt_tpu.ops import (
    bev_pool_v2,
    inverse,
    inverse_4x4,
    modulated_deform_conv2d,
    multi_head_attention,
    qkv,
    rotate,
)


def _mad(a, b):
    return float(np.mean(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))


# ---------------------------------------------------------------- rotate ---
def torch_rotate_oracle(img, angle, center, interpolation):
    """torchvision-free re-derivation of the reference rotate contract
    (det2trt/models/functions/rotate.py:12-80)."""
    img = torch.from_numpy(img)
    angle = torch.tensor(angle)
    center = torch.from_numpy(center)
    oh, ow = img.shape[-2:]
    cx = center[0] - ow * 0.5
    cy = center[1] - oh * 0.5
    a = -angle * math.pi / 180
    theta = torch.stack(
        [
            torch.cos(a),
            torch.sin(a),
            -cx * torch.cos(a) - cy * torch.sin(a) + cx,
            -torch.sin(a),
            torch.cos(a),
            cx * torch.sin(a) - cy * torch.cos(a) + cy,
        ]
    ).reshape(1, 2, 3)
    d = 0.5
    base_grid = torch.empty(1, oh, ow, 3)
    base_grid[..., 0] = torch.linspace(-ow * 0.5 + d, ow * 0.5 + d - 1, ow)
    base_grid[..., 1] = torch.linspace(-oh * 0.5 + d, oh * 0.5 + d - 1, oh).unsqueeze(-1)
    base_grid[..., 2] = 1
    rescaled = 2 * theta.transpose(1, 2)
    rescaled[..., 0] /= ow
    rescaled[..., 1] /= oh
    grid = base_grid.reshape(1, oh * ow, 3).bmm(rescaled).reshape(1, oh, ow, 2)
    mode = {"bilinear": "bilinear", "nearest": "nearest"}[interpolation]
    out = F.grid_sample(img.unsqueeze(0), grid, mode=mode, padding_mode="zeros", align_corners=False)
    return out.squeeze(0).numpy()


@pytest.mark.parametrize("interp", ["bilinear", "nearest"])
def test_rotate(rng, interp):
    img = rng.standard_normal((4, 20, 24)).astype(np.float32)
    angle = 33.7
    center = np.array([12.0, 10.0], np.float32)
    ours = rotate(img, np.float32(angle), center, interpolation=interp)
    ref = torch_rotate_oracle(img, angle, center, interp)
    assert _mad(ours, ref) < 1e-5


# ----------------------------------------------------------- bev_pool_v2 ---
def test_bev_pool_v2(rng):
    N, D, H, W, C = 2, 4, 5, 6, 8
    out_h, out_w = 16, 16
    P = 200
    depth = rng.random((N, D, H, W)).astype(np.float32)
    feat = rng.standard_normal((N, H, W, C)).astype(np.float32)
    ranks_depth = rng.integers(0, N * D * H * W, P).astype(np.int32)
    ranks_feat = rng.integers(0, N * H * W, P).astype(np.int32)
    ranks_bev = np.sort(rng.integers(0, out_h * out_w, P)).astype(np.int32)
    ranks_bev[-20:] = -1  # padded tail

    ours = np.asarray(bev_pool_v2(depth, feat, ranks_depth, ranks_feat, ranks_bev,
                                  out_height=out_h, out_width=out_w))

    expected = np.zeros((out_h * out_w, C), np.float64)
    df = depth.reshape(-1).astype(np.float64)
    ff = feat.reshape(-1, C).astype(np.float64)
    for i in range(P):
        if ranks_bev[i] >= 0:
            expected[ranks_bev[i]] += df[ranks_depth[i]] * ff[ranks_feat[i]]
    assert _mad(ours.reshape(-1, C), expected) < 1e-6


def test_bev_pool_v2_interval_matches_scatter(rng):
    """impl='interval' (cumsum + boundary differences + unique-cell scatter,
    the TPU form) must match the scatter-add reference to f32 cumsum
    precision, including pad intervals and the -1 rank tail."""
    N, D, H, W, C = 4, 8, 12, 20, 16
    out_h, out_w = 32, 32
    P = 20000
    depth = rng.random((N, D, H, W)).astype(np.float32)
    feat = rng.standard_normal((N, H, W, C)).astype(np.float32)
    ranks_depth = rng.integers(0, N * D * H * W, P).astype(np.int32)
    ranks_feat = rng.integers(0, N * H * W, P).astype(np.int32)
    ranks_bev = np.sort(rng.integers(0, out_h * out_w, P)).astype(np.int32)
    ranks_bev[-500:] = -1  # padded tail (valid prefix stays sorted)

    valid = ranks_bev >= 0
    rbv = ranks_bev[valid.nonzero()[0]]
    first = np.ones(len(rbv), bool)
    first[1:] = rbv[1:] != rbv[:-1]
    starts = np.flatnonzero(first).astype(np.int32)
    lengths = np.diff(np.append(starts, len(rbv))).astype(np.int32)
    I_pad = out_h * out_w  # static interval pad, like voxel_pooling_prepare
    s = np.zeros(I_pad, np.int32)
    l = np.zeros(I_pad, np.int32)
    s[: len(starts)] = starts
    l[: len(lengths)] = lengths

    a = np.asarray(bev_pool_v2(depth, feat, ranks_depth, ranks_feat, ranks_bev,
                               out_height=out_h, out_width=out_w))
    b = np.asarray(bev_pool_v2(depth, feat, ranks_depth, ranks_feat, ranks_bev,
                               s, l, out_height=out_h, out_width=out_w,
                               impl="interval"))
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 1e-5, rel


# ------------------------------------------------------------------- qkv ---
def test_qkv(rng):
    B, qlen, kvlen, dim = 3, 17, 29, 32
    q = rng.standard_normal((B, qlen, dim)).astype(np.float32)
    k = rng.standard_normal((B, kvlen, dim)).astype(np.float32)
    v = rng.standard_normal((B, kvlen, dim)).astype(np.float32)
    ours = qkv(q, k, v)
    qt, kt, vt = map(torch.from_numpy, (q, k, v))
    ref = torch.matmul(
        torch.matmul(qt / math.sqrt(dim), kt.transpose(1, 2)).softmax(-1), vt
    ).numpy()
    assert _mad(ours, ref) < 1e-6


def test_multi_head_attention_matches_torch(rng):
    B, L, E, h = 2, 16, 64, 8
    q = rng.standard_normal((B, L, E)).astype(np.float32)
    k = rng.standard_normal((B, L, E)).astype(np.float32)
    v = rng.standard_normal((B, L, E)).astype(np.float32)
    ours = multi_head_attention(q, k, v, num_heads=h)
    ref = F.scaled_dot_product_attention(
        torch.from_numpy(q).reshape(B, L, h, E // h).transpose(1, 2),
        torch.from_numpy(k).reshape(B, L, h, E // h).transpose(1, 2),
        torch.from_numpy(v).reshape(B, L, h, E // h).transpose(1, 2),
    ).transpose(1, 2).reshape(B, L, E).numpy()
    assert _mad(ours, ref) < 1e-6


# ------------------------------------------------------------------- dcn ---
def numpy_dcn_oracle(x, offset, mask, weight, bias, stride, padding, dilation, groups, dg):
    """Scalar-loop DCNv2 oracle (mmcv modulated_deform_conv semantics)."""
    N, Cin, H, W = x.shape
    Cout, Cin_g, kh, kw = weight.shape
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    x = x.astype(np.float64)
    out = np.zeros((N, Cout, Ho, Wo))

    def bil(n, c, py, px):
        if py <= -1 or py >= H or px <= -1 or px >= W:
            return 0.0
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        v = 0.0
        for (yy, wy) in ((y0, 1 - (py - y0)), (y0 + 1, py - y0)):
            for (xx, wx) in ((x0, 1 - (px - x0)), (x0 + 1, px - x0)):
                if 0 <= yy < H and 0 <= xx < W:
                    v += wy * wx * x[n, c, yy, xx]
        return v

    cpg = Cin // dg  # channels per deform group
    opg = Cout // groups
    ipg = Cin // groups
    for n in range(N):
        for ho in range(Ho):
            for wo in range(Wo):
                for t in range(kh * kw):
                    i, j = t // kw, t % kw
                    for g in range(dg):
                        oy = offset[n, 2 * (g * kh * kw + t), ho, wo]
                        ox = offset[n, 2 * (g * kh * kw + t) + 1, ho, wo]
                        m = mask[n, g * kh * kw + t, ho, wo]
                        py = ho * stride - padding + i * dilation + oy
                        px = wo * stride - padding + j * dilation + ox
                        for ci in range(g * cpg, (g + 1) * cpg):
                            s = bil(n, ci, py, px) * m
                            grp = ci // ipg
                            for co in range(grp * opg, (grp + 1) * opg):
                                out[n, co, ho, wo] += s * weight[co, ci % ipg, i, j]
    if bias is not None:
        out += bias[None, :, None, None]
    return out


@pytest.mark.parametrize("dg", [1, 2])
def test_modulated_deform_conv2d(rng, dg):
    N, Cin, H, W = 1, 4, 6, 7
    Cout, kh, kw = 6, 3, 3
    stride, padding, dilation = 1, 1, 1
    x = rng.standard_normal((N, Cin, H, W)).astype(np.float32)
    offset = (rng.standard_normal((N, 2 * dg * kh * kw, H, W)) * 1.5).astype(np.float32)
    mask = rng.random((N, dg * kh * kw, H, W)).astype(np.float32)
    weight = (rng.standard_normal((Cout, Cin, kh, kw)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(Cout).astype(np.float32)

    ours = modulated_deform_conv2d(
        x, offset, mask, weight, bias, stride, padding, dilation, 1, dg
    )
    ref = numpy_dcn_oracle(x, offset, mask, weight, bias, stride, padding, dilation, 1, dg)
    assert _mad(ours, ref) < 1e-5


def test_dcn_zero_offset_equals_conv(rng):
    """With zero offsets and mask==1, DCN must equal a plain conv."""
    N, Cin, H, W, Cout = 1, 4, 8, 8, 5
    x = rng.standard_normal((N, Cin, H, W)).astype(np.float32)
    weight = (rng.standard_normal((Cout, Cin, 3, 3)) * 0.2).astype(np.float32)
    offset = np.zeros((N, 18, H, W), np.float32)
    mask = np.ones((N, 9, H, W), np.float32)
    ours = modulated_deform_conv2d(x, offset, mask, weight, None)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(weight), padding=1).numpy()
    assert _mad(ours, ref) < 1e-5


# --------------------------------------------------------------- inverse ---
def test_inverse(rng):
    mats = rng.standard_normal((7, 4, 4)).astype(np.float32)
    mats += 4 * np.eye(4, dtype=np.float32)  # well-conditioned
    ref = np.linalg.inv(mats.astype(np.float64))
    assert _mad(inverse(mats), ref) < 1e-5
    assert _mad(inverse_4x4(mats), ref) < 1e-5


@pytest.mark.parametrize("stride,cin", [(1, 32), (2, 64)])
def test_dcn_pallas_matches_xla(rng, stride, cin):
    """Pallas im2col DCN path (interpret mode, f32 tables) must match the
    XLA formulation exactly — covers channel groups (G=Cin/32) and stride."""
    from bevformer_tensorrt_tpu.ops.dcn import _dcn_pallas, _dcn_xla

    N, Cin, H, W = 2, cin, 9, 11
    Cout, kh, kw = 8, 3, 3
    x = rng.standard_normal((N, Cin, H, W)).astype(np.float32)
    Ho = (H + 2 - 2 - 1) // stride + 1
    Wo = (W + 2 - 2 - 1) // stride + 1
    offset = (rng.standard_normal((N, 2 * kh * kw, Ho, Wo)) * 1.5).astype(np.float32)
    mask = rng.random((N, kh * kw, Ho, Wo)).astype(np.float32)
    weight = (rng.standard_normal((Cout, Cin, kh, kw)) * 0.1).astype(np.float32)
    a = _dcn_pallas(
        x, offset, mask, weight, stride, 1, 1, packed=False, interpret=True
    )
    b = _dcn_xla(x, offset, mask, weight, stride, 1, 1, 1, 1)
    assert _mad(a, np.asarray(b)) < 1e-5

    # DCN_RG=9: all taps in ONE union sweep per block (sweep-layout A/B
    # knob) — exact for any grouping, like every sorted-kernel layout knob
    import jax

    monkey = pytest.MonkeyPatch()
    try:
        monkey.setenv("DCN_RG", "9")
        jax.clear_caches()  # rg is baked at trace time
        a9 = _dcn_pallas(
            x, offset, mask, weight, stride, 1, 1, packed=False, interpret=True
        )
    finally:
        monkey.undo()
        jax.clear_caches()
    assert _mad(a9, np.asarray(b)) < 1e-5


@pytest.mark.parametrize("packed", [False, True, "int8"])
def test_dcn_nhwc_layout_matches_nchw(rng, packed):
    """layout='NHWC' (channel-last table pack + pixels-major GEMM emit,
    the backbone path) must match the NCHW path bit-for-bit: same words,
    same gather, same contraction — only layouts differ."""
    from bevformer_tensorrt_tpu.ops.dcn import _dcn_pallas

    N, Cin, H, W = 2, 64, 9, 11
    Cout, kh, kw = 8, 3, 3
    x = rng.standard_normal((N, Cin, H, W)).astype(np.float32)
    offset = (rng.standard_normal((N, 2 * kh * kw, H, W)) * 1.5).astype(np.float32)
    mask = rng.random((N, kh * kw, H, W)).astype(np.float32)
    weight = (rng.standard_normal((Cout, Cin, kh, kw)) * 0.1).astype(np.float32)
    a = np.asarray(
        _dcn_pallas(x, offset, mask, weight, 1, 1, 1, packed=packed, interpret=True)
    )
    b = np.asarray(
        _dcn_pallas(
            x.transpose(0, 2, 3, 1),
            offset.transpose(0, 2, 3, 1),
            mask.transpose(0, 2, 3, 1),
            weight, 1, 1, 1, packed=packed, interpret=True, layout="NHWC",
        )
    )
    assert _mad(a, b.transpose(0, 3, 1, 2)) == 0.0


def test_dcn_nhwc_xla_fallback_and_grad(rng):
    """Public-API NHWC on the XLA fallback path (impl='jnp') matches NCHW,
    and the custom-vjp backward runs in NHWC layout."""
    import jax

    N, Cin, H, W, Cout = 1, 32, 6, 7, 4
    x = rng.standard_normal((N, Cin, H, W)).astype(np.float32)
    offset = (rng.standard_normal((N, 18, H, W)) * 1.5).astype(np.float32)
    mask = rng.random((N, 9, H, W)).astype(np.float32)
    weight = (rng.standard_normal((Cout, Cin, 3, 3)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(Cout).astype(np.float32)
    a = modulated_deform_conv2d(x, offset, mask, weight, bias, impl="jnp")
    b = modulated_deform_conv2d(
        x.transpose(0, 2, 3, 1), offset.transpose(0, 2, 3, 1),
        mask.transpose(0, 2, 3, 1), weight, bias, impl="jnp", layout="NHWC",
    )
    assert _mad(a, np.asarray(b).transpose(0, 3, 1, 2)) < 1e-6

    from bevformer_tensorrt_tpu.ops.dcn import _dcn_pallas_diff

    def loss(xi):
        return _dcn_pallas_diff(
            xi, jnp.asarray(offset.transpose(0, 2, 3, 1)),
            jnp.asarray(mask.transpose(0, 2, 3, 1)), jnp.asarray(weight),
            1, 1, 1, False, "NHWC",
        ).sum()

    g = jax.grad(loss)(jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert g.shape == (N, H, W, Cin) and np.isfinite(np.asarray(g)).all()


def test_dcn_pallas_int8_close(rng):
    """int8-packed DCN tables (quant='int8' backbone path): per-(image,
    channel-group) dynamic scales keep the error ~1% of signal."""
    from bevformer_tensorrt_tpu.ops.dcn import _dcn_pallas, _dcn_xla

    N, Cin, H, W = 2, 64, 9, 11
    Cout = 8
    x = rng.standard_normal((N, Cin, H, W)).astype(np.float32)
    offset = (rng.standard_normal((N, 18, H, W)) * 1.5).astype(np.float32)
    mask = rng.random((N, 9, H, W)).astype(np.float32)
    weight = (rng.standard_normal((Cout, Cin, 3, 3)) * 0.1).astype(np.float32)
    a = np.asarray(
        _dcn_pallas(x, offset, mask, weight, 1, 1, 1, packed="int8", interpret=True)
    )
    b = np.asarray(_dcn_xla(x, offset, mask, weight, 1, 1, 1, 1, 1))
    rel = np.abs(a - b).mean() / (np.abs(b).mean() + 1e-9)
    assert rel < 0.03, rel
