"""Whole-detector torch oracle for BEVFormer import parity (test helper).

Functional torch re-implementation of the reference's end-to-end
forward_trt chain, operating directly on a reference-layout state_dict:

  BEVFormerTRT.forward_trt       det2trt/models/detector/bevformer.py:37-44
  mmcv ResNet (pytorch style)    torchvision-equivalent bottleneck stack
  mmdet FPN                      configs/bevformer/bevformer_tiny.py neck
  BEVFormerHeadTRT.forward_trt   det2trt/models/dense_heads/bevformer_head.py:121-188
  PerceptionTransformerTRTP      det2trt/models/modules/transformer.py:239-398
  BEVFormerEncoderTRT/Layer      det2trt/models/modules/encoder.py:76-160, 503-636
  TemporalSelfAttentionTRT       temporal_self_attention.py:118-313
  SpatialCrossAttentionTRTP      spatial_cross_attention.py:233-273, 460-520
  DetectionTransformerDecoderTRTP decoder.py:40-113 + CustomMSDeformableAttention
  rotate                         det2trt/models/functions/rotate.py:12-80

It composes the module-level oracle math already diffed in
tests/test_reference_parity.py (msda_torch, TSA/SCA/decoder-CA forward
order, point_sampling, can_bus shift) into one detector so that a single
imported checkpoint can be compared end to end — any wiring bug anywhere in
runtime/torch_import.py or the flax model shows up as an output diff.

NOT derived from this repo's flax code: every step follows the reference's
torch source cited above, so agreement is evidence of parity with the
reference, not self-consistency.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


# --------------------------------------------------------------- helpers ---
def _w(sd, k):
    return torch.from_numpy(np.asarray(sd[f"{k}.weight"]))


def _b(sd, k):
    return torch.from_numpy(np.asarray(sd[f"{k}.bias"]))


def _lin(sd, k, x):
    return F.linear(x, _w(sd, k), _b(sd, k) if f"{k}.bias" in sd else None)


def _ln(sd, k, x):
    C = x.shape[-1]
    return F.layer_norm(x, (C,), _w(sd, k), _b(sd, k))


def _bn(sd, k, x, eps=1e-5):
    m = torch.from_numpy(np.asarray(sd[f"{k}.running_mean"]))
    v = torch.from_numpy(np.asarray(sd[f"{k}.running_var"]))
    sh = [1, -1] + [1] * (x.ndim - 2)
    return (x - m.view(sh)) / torch.sqrt(v.view(sh) + eps) * _w(sd, k).view(sh) + _b(
        sd, k
    ).view(sh)


def _conv_bn_relu(sd, ck, bk, x, stride=1, pad=0):
    x = F.conv2d(x, _w(sd, ck), stride=stride, padding=pad)
    return F.relu(_bn(sd, bk, x))


# ---------------------------------------------------------------- resnet ---
def torch_resnet(sd, prefix, x, depth=50, style="pytorch"):
    """mmcv ResNet bottleneck stack (pytorch style: stride on the 3x3;
    caffe style: stride on the first 1x1), returning all 4 stage outputs."""
    from bevformer_tensorrt_tpu.models.backbones.resnet import STAGE_BLOCKS

    x = _conv_bn_relu(sd, f"{prefix}.conv1", f"{prefix}.bn1", x, stride=2, pad=3)
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    outs = []
    for stage in range(4):
        stride = 1 if stage == 0 else 2
        for blk in range(STAGE_BLOCKS[depth][stage]):
            src = f"{prefix}.layer{stage + 1}.{blk}"
            s = stride if blk == 0 else 1
            s1, s2 = (s, 1) if style == "caffe" else (1, s)
            out = _conv_bn_relu(sd, f"{src}.conv1", f"{src}.bn1", x, stride=s1)
            out = _conv_bn_relu(sd, f"{src}.conv2", f"{src}.bn2", out, stride=s2, pad=1)
            out = _bn(sd, f"{src}.bn3", F.conv2d(out, _w(sd, f"{src}.conv3")))
            if f"{src}.downsample.0.weight" in sd:
                idn = _bn(
                    sd,
                    f"{src}.downsample.1",
                    F.conv2d(x, _w(sd, f"{src}.downsample.0"), stride=s),
                )
            else:
                idn = x
            x = F.relu(out + idn)
        outs.append(x)
    return outs


def torch_fpn(sd, feats, num_outs):
    """mmdet FPN (start_level=0, add_extra_convs='on_output',
    relu_before_extra_convs=True) — bevformer_base.py:56-64."""
    lat = [
        F.conv2d(f, _w(sd, f"img_neck.lateral_convs.{i}.conv"),
                 _b(sd, f"img_neck.lateral_convs.{i}.conv"))
        for i, f in enumerate(feats)
    ]
    for i in range(len(lat) - 1, 0, -1):
        up = F.interpolate(lat[i], scale_factor=2, mode="nearest")
        lat[i - 1] = lat[i - 1] + up[:, :, : lat[i - 1].shape[2], : lat[i - 1].shape[3]]
    outs = [
        F.conv2d(l, _w(sd, f"img_neck.fpn_convs.{i}.conv"),
                 _b(sd, f"img_neck.fpn_convs.{i}.conv"), padding=1)
        for i, l in enumerate(lat)
    ]
    for i in range(len(feats), num_outs):
        src = F.relu(outs[-1]) if i > len(feats) else outs[-1]
        outs.append(
            F.conv2d(src, _w(sd, f"img_neck.fpn_convs.{i}.conv"),
                     _b(sd, f"img_neck.fpn_convs.{i}.conv"), stride=2, padding=1)
        )
    return outs[:num_outs]


# ----------------------------------------------------------------- geometry ---
def torch_rotate(img, angle, center, mode="nearest"):
    """Reference rotate contract (det2trt/models/functions/rotate.py:12-80,
    torchvision F.rotate semantics). img [C, H, W]."""
    oh, ow = img.shape[-2:]
    cx, cy = center[0] - ow * 0.5, center[1] - oh * 0.5
    a = -float(angle) * math.pi / 180
    theta = torch.tensor(
        [
            [math.cos(a), math.sin(a), -cx * math.cos(a) - cy * math.sin(a) + cx],
            [-math.sin(a), math.cos(a), cx * math.sin(a) - cy * math.cos(a) + cy],
        ],
        dtype=img.dtype,
    )[None]
    d = 0.5
    base = torch.empty(1, oh, ow, 3, dtype=img.dtype)
    base[..., 0] = torch.linspace(-ow * 0.5 + d, ow * 0.5 + d - 1, ow, dtype=img.dtype)
    base[..., 1] = torch.linspace(
        -oh * 0.5 + d, oh * 0.5 + d - 1, oh, dtype=img.dtype
    ).unsqueeze(-1)
    base[..., 2] = 1
    resc = 2 * theta.transpose(1, 2)
    resc[..., 0] /= ow
    resc[..., 1] /= oh
    grid = base.reshape(1, oh * ow, 3).bmm(resc).reshape(1, oh, ow, 2)
    return F.grid_sample(
        img[None], grid, mode=mode, padding_mode="zeros", align_corners=False
    )[0]


def torch_point_sampling(ref_3d, pc_range, l2i, img_hw, cams):
    """encoder.py:197-259 point_sampling_trt + the any-visible/count mask
    weighting of :256-258. ref_3d [1, pillar, nq, 3]; l2i [cams, 4, 4]."""
    rp = torch.from_numpy(np.asarray(ref_3d, np.float32)).clone()
    for d in range(3):
        rp[..., d] = rp[..., d] * (pc_range[d + 3] - pc_range[d]) + pc_range[d]
    rp = torch.cat([rp, torch.ones_like(rp[..., :1])], -1)  # [1, D, nq, 4]
    D, nq = rp.shape[1], rp.shape[2]
    rp = rp.permute(1, 0, 2, 3).view(D, 1, 1, nq, 4).repeat(1, 1, cams, 1, 1).unsqueeze(-1)
    l2i_t = torch.from_numpy(np.asarray(l2i, np.float32)).view(1, 1, cams, 1, 4, 4)
    cam = torch.matmul(l2i_t.repeat(D, 1, 1, nq, 1, 1), rp).squeeze(-1)
    eps = 1e-5
    m = cam[..., 2:3] > eps
    xy = cam[..., 0:2] / torch.max(cam[..., 2:3], torch.ones_like(cam[..., 2:3]) * eps)
    xy[..., 0] /= img_hw[1]
    xy[..., 1] /= img_hw[0]
    m = (
        m
        & (xy[..., 1:2] > 0.0)
        & (xy[..., 1:2] < 1.0)
        & (xy[..., 0:1] < 1.0)
        & (xy[..., 0:1] > 0.0)
    )
    ref_cam = xy.permute(2, 1, 3, 0, 4)[:, 0]  # [cams, nq, D, 2]
    anyv = m.permute(2, 1, 3, 0, 4)[:, 0, :, :, 0].any(-1).float()  # [cams, nq]
    count = anyv.sum(0, keepdim=True).clamp(min=1.0)
    mask = (anyv / count)[..., None]  # [cams, nq, 1]
    return ref_cam, mask


# ----------------------------------------------------------- attention math ---
def _msda(value, shapes, loc, w):
    """mmcv multi_scale_deformable_attn_pytorch (the module oracle's
    msda_torch, spatial_cross_attention.py:560-660)."""
    B, _, H, ch = value.shape
    nq, L, P = loc.shape[1], loc.shape[3], loc.shape[4]
    out = torch.zeros(B * H, ch, nq, dtype=value.dtype)
    start = 0
    for lvl, (Hh, Ww) in enumerate(shapes):
        v = value[:, start : start + Hh * Ww].permute(0, 2, 3, 1).reshape(B * H, ch, Hh, Ww)
        g = 2 * loc[:, :, :, lvl] - 1
        g = g.permute(0, 2, 1, 3, 4).reshape(B * H, nq, P, 2)
        sv = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        wl = w[:, :, :, lvl].permute(0, 2, 1, 3).reshape(B * H, 1, nq, P)
        out = out + (sv * wl).sum(-1)
        start += Hh * Ww
    return out.reshape(B, H * ch, nq).permute(0, 2, 1)


def _tsa(sd, pre, query, value, query_pos, ref, shapes, H, P):
    """temporal_self_attention.py:118-313 (Q=2 frame queue); identity is the
    RAW query (set before the query_pos add, :176-179)."""
    C = query.shape[-1]
    nq = query.shape[1]
    Q, L = 2, 1
    identity = query
    q = query + query_pos
    qcat = torch.cat([value[:1], q], -1)
    v = _lin(sd, f"{pre}.value_proj", value).reshape(Q, -1, H, C // H)
    off = _lin(sd, f"{pre}.sampling_offsets", qcat).view(1, nq, H, Q, L, P, 2)
    attn = _lin(sd, f"{pre}.attention_weights", qcat).view(1, nq, H, Q, L * P).softmax(-1)
    attn = attn.view(1, nq, H, Q, L, P).permute(0, 3, 1, 2, 4, 5).reshape(Q, nq, H, L, P)
    off = off.permute(0, 3, 1, 2, 4, 5, 6).reshape(Q, nq, H, L, P, 2)
    norm = torch.tensor([[float(w_), float(h_)] for (h_, w_) in shapes])
    loc = ref[:, :, None, :, None, :] + off / norm[None, None, None, :, None, :]
    out = _msda(v, shapes, loc, attn)
    out = out.permute(1, 2, 0).view(nq, C, 1, Q).mean(-1).permute(2, 0, 1)
    return _lin(sd, f"{pre}.output_proj", out) + identity


def _sca(sd, pre, query, value, ref_cam, bev_mask, shapes, H, L, P):
    """spatial_cross_attention.py TRTP (:233-273, :460-520), query_pos=None."""
    C = query.shape[-1]
    cams, nq = ref_cam.shape[0], query.shape[1]
    Z = ref_cam.shape[2]
    q = query.repeat(cams, 1, 1)
    da = f"{pre}.deformable_attention"
    v = _lin(sd, f"{da}.value_proj", value).view(cams, -1, H, C // H)
    off = _lin(sd, f"{da}.sampling_offsets", q).view(cams, nq, H, L, P, 2)
    attn = _lin(sd, f"{da}.attention_weights", q).view(cams, nq, H, L * P).softmax(-1)
    attn = attn.view(cams, nq, H, L, P)
    norm = torch.tensor([[float(w_), float(h_)] for (h_, w_) in shapes])
    off = off / norm[None, None, None, :, None, :]
    off = off.view(cams, nq, H, L, P // Z, Z, 2)
    loc = (ref_cam[:, :, None, None, None, :, :] + off).view(cams, nq, H, L, P, 2)
    out = _msda(v, shapes, loc, attn)
    slots = (out * bev_mask).sum(0, keepdim=True)
    return _lin(sd, f"{pre}.output_proj", slots) + query


def _decoder_ca(sd, pre, query, value, query_pos, ref2d, shapes, H, P):
    """decoder.py:195-345 CustomMSDeformableAttention (L=1)."""
    C = query.shape[-1]
    nq = query.shape[1]
    L = 1
    identity = query
    q = query + query_pos
    v = _lin(sd, f"{pre}.value_proj", value).view(1, -1, H, C // H)
    off = _lin(sd, f"{pre}.sampling_offsets", q).view(1, nq, H, L, P, 2)
    attn = _lin(sd, f"{pre}.attention_weights", q).view(1, nq, H, L * P).softmax(-1)
    attn = attn.view(1, nq, H, L, P)
    norm = torch.tensor([[float(w_), float(h_)] for (h_, w_) in shapes])
    loc = ref2d[:, :, None, :, None, :] + off / norm[None, None, None, :, None, :]
    out = _msda(v, shapes, loc, attn)
    return _lin(sd, f"{pre}.output_proj", out) + identity


def _mha(sd, pre, query, query_pos, H):
    """mmcv MultiheadAttentionTRT wrapping nn.MultiheadAttention
    (multi_head_attention.py:110-255): q=k=query+pos, v=query, +identity."""
    identity = query
    q = (query + query_pos).transpose(0, 1)  # [nq, 1, C]
    v = query.transpose(0, 1)
    out, _ = F.multi_head_attention_forward(
        q, q, v, q.shape[-1], H,
        torch.from_numpy(np.asarray(sd[f"{pre}.attn.in_proj_weight"], np.float32)),
        torch.from_numpy(np.asarray(sd[f"{pre}.attn.in_proj_bias"], np.float32)),
        None, None, False, 0.0,
        _w(sd, f"{pre}.attn.out_proj"), _b(sd, f"{pre}.attn.out_proj"),
        training=False, need_weights=False,
    )
    return out.transpose(0, 1) + identity


def _ffn(sd, pre, x):
    """FFNTRT (feedforward_network.py:20-68): fc -> relu -> fc + residual."""
    out = F.relu(_lin(sd, f"{pre}.ffns.0.layers.0.0", x))
    return x + _lin(sd, f"{pre}.ffns.0.layers.1", out)


def _inverse_sigmoid(x, eps=1e-5):
    x = x.clamp(0, 1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


# -------------------------------------------------------------- full model ---
def torch_bevformer_forward(sd, cfg, image, prev_bev, use_prev_bev, can_bus, lidar2img):
    """End-to-end reference forward (detector/bevformer.py:37-44 contract):
    image [1, cams, 3, H, W], prev_bev [nq, 1, C], use_prev_bev scalar,
    can_bus [18], lidar2img [1, cams, 4, 4] -> (bev_embed [nq, 1, C],
    outputs_classes [Ld, 1, num_query, classes], outputs_coords)."""
    from bevformer_tensorrt_tpu.models.modules.encoder import get_reference_points_3d

    C = cfg.embed_dims
    H = cfg.num_heads
    nq = cfg.bev_h * cfg.bev_w
    cams = cfg.num_cams
    img = torch.from_numpy(np.asarray(image, np.float32)).reshape(
        cams, 3, cfg.img_h, cfg.img_w
    )

    # backbone + neck
    style = "caffe" if cfg.backbone_depth == 101 else "pytorch"
    feats = torch_resnet(sd, "img_backbone", img, depth=cfg.backbone_depth, style=style)
    feats = [feats[i] for i in cfg.backbone_out_indices]
    mlvl = torch_fpn(sd, feats, cfg.num_levels)  # [cams, C, h, w] per level

    # head embeddings + positional encoding (bevformer_head.py:121-145)
    bev_queries = torch.from_numpy(np.asarray(sd["pts_bbox_head.bev_embedding.weight"], np.float32))
    object_query = torch.from_numpy(np.asarray(sd["pts_bbox_head.query_embedding.weight"], np.float32))
    row = torch.from_numpy(
        np.asarray(sd["pts_bbox_head.positional_encoding.row_embed.weight"], np.float32))
    col = torch.from_numpy(
        np.asarray(sd["pts_bbox_head.positional_encoding.col_embed.weight"], np.float32))
    x_emb = col[None, :, :].expand(cfg.bev_h, -1, -1)
    y_emb = row[:, None, :].expand(-1, cfg.bev_w, -1)
    bev_pos = torch.cat([x_emb, y_emb], -1).reshape(1, nq, C)  # [1, nq, C]

    t = "pts_bbox_head.transformer"
    cb = torch.from_numpy(np.asarray(can_bus, np.float32))

    # ego shift (transformer.py:262-294)
    delta_x, delta_y = cb[0:1], cb[1:2]
    ego_angle = cb[-2:-1] / np.pi * 180
    gl_y, gl_x = cfg.grid_length
    tl = torch.sqrt(delta_x**2 + delta_y**2)
    ta = (
        torch.atan(delta_y / (delta_x + 1e-8))
        + ((1 - torch.sign(delta_x)) / 2) * torch.sign(delta_y) * np.pi
    ) / np.pi * 180
    ba = ego_angle - ta
    shift_y = tl * torch.cos(ba / 180 * np.pi) / gl_y / cfg.bev_h * int(cfg.use_shift)
    shift_x = tl * torch.sin(ba / 180 * np.pi) / gl_x / cfg.bev_w * int(cfg.use_shift)
    shift = torch.cat([shift_x, shift_y])  # [2]

    # rotate prev bev (transformer.py:296-303)
    pb = torch.from_numpy(np.asarray(prev_bev, np.float32))
    if cfg.rotate_prev_bev:
        r = torch_rotate(
            pb.view(cfg.bev_h, cfg.bev_w, C).permute(2, 0, 1),
            float(can_bus[-1]),
            cfg.rotate_center,
            mode="nearest",
        )
        pb = r.permute(1, 2, 0).reshape(1, nq, C)
    else:
        pb = pb.reshape(1, nq, C)

    # can-bus mlp (transformer.py:305-308); mmcv MLP keys can_bus_mlp.{0,2,norm}
    cbf = F.relu(_lin(sd, f"{t}.can_bus_mlp.0", cb.view(1, -1)))
    cbf = F.relu(_lin(sd, f"{t}.can_bus_mlp.2", cbf))
    cbf = _ln(sd, f"{t}.can_bus_mlp.norm", cbf)
    bev_q = bev_queries[None] + cbf[:, None, :] * int(cfg.use_can_bus)  # [1, nq, C]

    # flatten features + cam/level embeds (transformer.py:310-323)
    cams_emb = torch.from_numpy(np.asarray(sd[f"{t}.cams_embeds"], np.float32))
    lvl_emb = torch.from_numpy(np.asarray(sd[f"{t}.level_embeds"], np.float32))
    flat, shapes = [], []
    for lvl, f in enumerate(mlvl):
        _, c, h, w = f.shape
        fl = f.flatten(2).permute(0, 2, 1)  # [cams, hw, C]
        fl = fl + cams_emb[:, None, :] + lvl_emb[lvl][None, None, :]
        flat.append(fl)
        shapes.append((h, w))
    value = torch.cat(flat, 1)  # [cams, keys, C]
    shapes = tuple(shapes)

    # encoder (encoder.py:76-160)
    ref_3d = get_reference_points_3d(cfg.bev_h, cfg.bev_w, cfg.num_points_in_pillar)
    ref_cam, bev_mask = torch_point_sampling(
        ref_3d, cfg.pc_range, np.asarray(lidar2img, np.float32).reshape(cams, 4, 4),
        (cfg.img_h, cfg.img_w), cams,
    )
    ref_2d = torch.from_numpy(ref_3d[0, 0, :, :2].copy()).view(1, nq, 1, 2)
    shift_ref = ref_2d + shift.view(1, 1, 1, 2) * float(use_prev_bev)
    hybrid_ref = torch.cat([shift_ref, ref_2d], 0)  # [2, nq, 1, 2]
    prev_queue = torch.cat([pb, bev_q], 0)  # [2, nq, C]

    output = bev_q
    mux = float(use_prev_bev)
    for i in range(cfg.encoder_layers):
        e = f"{t}.encoder.layers.{i}"
        layer_prev = mux * prev_queue + (1 - mux) * output.repeat(2, 1, 1)
        q = _tsa(sd, f"{e}.attentions.0", output, layer_prev, bev_pos, hybrid_ref,
                 ((cfg.bev_h, cfg.bev_w),), H, cfg.num_points_self)
        q = _ln(sd, f"{e}.norms.0", q)
        q = _sca(sd, f"{e}.attentions.1", q, value, ref_cam, bev_mask, shapes,
                 H, cfg.num_levels, cfg.num_points_cross)
        q = _ln(sd, f"{e}.norms.1", q)
        q = _ffn(sd, e, q)
        output = _ln(sd, f"{e}.norms.2", q)
    bev_embed = output  # [1, nq, C]

    # decoder (transformer.py:376-394, decoder.py:40-113)
    query_pos, query = torch.split(object_query[None], C, dim=2)
    reference_points = torch.sigmoid(_lin(sd, f"{t}.reference_points", query_pos))
    init_reference = reference_points
    inter_states, inter_refs = [], []
    for i in range(cfg.decoder_layers):
        d = f"{t}.decoder.layers.{i}"
        ref2d = reference_points[..., :2].view(1, -1, 1, 2)
        q = _mha(sd, f"{d}.attentions.0", query, query_pos, H)
        q = _ln(sd, f"{d}.norms.0", q)
        q = _decoder_ca(sd, f"{d}.attentions.1", q, bev_embed, query_pos, ref2d,
                        ((cfg.bev_h, cfg.bev_w),), H, cfg.num_points_decoder)
        q = _ln(sd, f"{d}.norms.1", q)
        q = _ffn(sd, d, q)
        query = _ln(sd, f"{d}.norms.2", q)
        r = f"pts_bbox_head.reg_branches.{i}"
        tmp = _lin(sd, f"{r}.4", F.relu(_lin(sd, f"{r}.2", F.relu(_lin(sd, f"{r}.0", query)))))
        reference_points = torch.sigmoid(
            torch.cat(
                [
                    tmp[..., :2] + _inverse_sigmoid(reference_points[..., :2]),
                    tmp[..., 4:5] + _inverse_sigmoid(reference_points[..., 2:3]),
                ],
                -1,
            )
        )
        inter_states.append(query)
        inter_refs.append(reference_points)

    # per-level heads + decode (bevformer_head.py:157-187)
    out_cls, out_coord = [], []
    for lvl in range(cfg.decoder_layers):
        ref = init_reference if lvl == 0 else inter_refs[lvl - 1]
        ref = _inverse_sigmoid(ref)
        hs = inter_states[lvl]
        c = f"pts_bbox_head.cls_branches.{lvl}"
        x = F.relu(_ln(sd, f"{c}.1", _lin(sd, f"{c}.0", hs)))
        x = F.relu(_ln(sd, f"{c}.4", _lin(sd, f"{c}.3", x)))
        cls_out = _lin(sd, f"{c}.6", x)
        r = f"pts_bbox_head.reg_branches.{lvl}"
        tmp = _lin(sd, f"{r}.4", F.relu(_lin(sd, f"{r}.2", F.relu(_lin(sd, f"{r}.0", hs)))))
        xy = torch.sigmoid(tmp[..., 0:2] + ref[..., 0:2])
        z = torch.sigmoid(tmp[..., 4:5] + ref[..., 2:3])
        x0 = xy[..., 0:1] * (cfg.pc_range[3] - cfg.pc_range[0]) + cfg.pc_range[0]
        y0 = xy[..., 1:2] * (cfg.pc_range[4] - cfg.pc_range[1]) + cfg.pc_range[1]
        z0 = z * (cfg.pc_range[5] - cfg.pc_range[2]) + cfg.pc_range[2]
        out_cls.append(cls_out)
        out_coord.append(torch.cat([x0, y0, tmp[..., 2:4], z0, tmp[..., 5:]], -1))

    return (
        bev_embed.permute(1, 0, 2),  # [nq, 1, C]
        torch.stack(out_cls),
        torch.stack(out_coord),
    )


# ------------------------------------------------- synthetic state dict ---
def synthetic_bevformer_state_dict(cfg, rng):
    """Random reference-layout BEVFormer state_dict matching the mmcv key
    naming consumed by import_bevformer_checkpoint (tamed magnitudes so deep
    conv stacks stay O(1))."""
    from bevformer_tensorrt_tpu.models.backbones.resnet import STAGE_BLOCKS

    sd = {}

    def conv(key, i, o, k, bias=False, scale=0.12):
        fan = i * k * k
        sd[f"{key}.weight"] = (
            rng.standard_normal((o, i, k, k)) * scale / np.sqrt(max(fan / 9, 1))
        ).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = (rng.standard_normal(o) * 0.05).astype(np.float32)

    def bn(key, c):
        sd[f"{key}.weight"] = (1.0 + 0.2 * rng.random(c)).astype(np.float32)
        sd[f"{key}.bias"] = (0.1 * rng.standard_normal(c)).astype(np.float32)
        sd[f"{key}.running_mean"] = (0.1 * rng.standard_normal(c)).astype(np.float32)
        sd[f"{key}.running_var"] = (1.0 + 0.3 * rng.random(c)).astype(np.float32)

    def lin(key, i, o, scale=1.0):
        sd[f"{key}.weight"] = (
            rng.standard_normal((o, i)) * scale / np.sqrt(i)
        ).astype(np.float32)
        sd[f"{key}.bias"] = (rng.standard_normal(o) * 0.05).astype(np.float32)

    def ln(key, c):
        sd[f"{key}.weight"] = (1.0 + 0.1 * rng.random(c)).astype(np.float32)
        sd[f"{key}.bias"] = (0.05 * rng.standard_normal(c)).astype(np.float32)

    C = cfg.embed_dims
    H = cfg.num_heads
    depth = cfg.backbone_depth

    # backbone (bottleneck; stage planes 64/128/256/512, expansion 4)
    conv("img_backbone.conv1", 3, 64, 7)
    bn("img_backbone.bn1", 64)
    prev_out = 64  # stem output channels
    for stage in range(4):
        planes = 64 * (2 ** stage)
        for b_ in range(STAGE_BLOCKS[depth][stage]):
            src = f"img_backbone.layer{stage + 1}.{b_}"
            block_in = prev_out if b_ == 0 else planes * 4
            conv(f"{src}.conv1", block_in, planes, 1)
            bn(f"{src}.bn1", planes)
            conv(f"{src}.conv2", planes, planes, 3)
            if cfg.dcn_stages[stage]:
                conv(f"{src}.conv2.conv_offset", planes, 27, 3, bias=True)
                sd[f"{src}.conv2.conv_offset.weight"] *= 0.02
                sd[f"{src}.conv2.conv_offset.bias"] *= 0.02
            bn(f"{src}.bn2", planes)
            conv(f"{src}.conv3", planes, planes * 4, 1)
            bn(f"{src}.bn3", planes * 4)
            if b_ == 0:
                conv(f"{src}.downsample.0", block_in, planes * 4, 1)
                bn(f"{src}.downsample.1", planes * 4)
        prev_out = planes * 4

    # FPN over selected stages
    stage_out = [256, 512, 1024, 2048]
    ins = [stage_out[i] for i in cfg.backbone_out_indices]
    for i, cin in enumerate(ins):
        conv(f"img_neck.lateral_convs.{i}.conv", cin, C, 1, bias=True)
    for i in range(cfg.num_levels):
        cin = C
        conv(f"img_neck.fpn_convs.{i}.conv", cin, C, 3, bias=True)

    nq = cfg.bev_h * cfg.bev_w
    sd["pts_bbox_head.bev_embedding.weight"] = (
        rng.standard_normal((nq, C)) * 0.5
    ).astype(np.float32)
    sd["pts_bbox_head.query_embedding.weight"] = (
        rng.standard_normal((cfg.num_query, 2 * C)) * 0.5
    ).astype(np.float32)
    sd["pts_bbox_head.positional_encoding.row_embed.weight"] = (
        rng.standard_normal((cfg.bev_h, C // 2)) * 0.3
    ).astype(np.float32)
    sd["pts_bbox_head.positional_encoding.col_embed.weight"] = (
        rng.standard_normal((cfg.bev_w, C // 2)) * 0.3
    ).astype(np.float32)

    t = "pts_bbox_head.transformer"
    sd[f"{t}.cams_embeds"] = (rng.standard_normal((cfg.num_cams, C)) * 0.3).astype(np.float32)
    sd[f"{t}.level_embeds"] = (rng.standard_normal((cfg.num_levels, C)) * 0.3).astype(np.float32)
    lin(f"{t}.reference_points", C, 3)
    lin(f"{t}.can_bus_mlp.0", cfg.can_bus_dims, C // 2)
    lin(f"{t}.can_bus_mlp.2", C // 2, C)
    ln(f"{t}.can_bus_mlp.norm", C)

    for i in range(cfg.encoder_layers):
        e = f"{t}.encoder.layers.{i}"
        tsa = f"{e}.attentions.0"
        lin(f"{tsa}.sampling_offsets", 2 * C, 2 * H * 1 * cfg.num_points_self * 2, 0.1)
        lin(f"{tsa}.attention_weights", 2 * C, 2 * H * 1 * cfg.num_points_self, 0.3)
        lin(f"{tsa}.value_proj", C, C)
        lin(f"{tsa}.output_proj", C, C)
        sca = f"{e}.attentions.1.deformable_attention"
        lin(f"{sca}.sampling_offsets", C, H * cfg.num_levels * cfg.num_points_cross * 2, 0.1)
        lin(f"{sca}.attention_weights", C, H * cfg.num_levels * cfg.num_points_cross, 0.3)
        lin(f"{sca}.value_proj", C, C)
        lin(f"{e}.attentions.1.output_proj", C, C)
        lin(f"{e}.ffns.0.layers.0.0", C, cfg.ffn_dims)
        lin(f"{e}.ffns.0.layers.1", cfg.ffn_dims, C)
        for n in range(3):
            ln(f"{e}.norms.{n}", C)

    for i in range(cfg.decoder_layers):
        d = f"{t}.decoder.layers.{i}"
        mha = f"{d}.attentions.0.attn"
        sd[f"{mha}.in_proj_weight"] = (
            rng.standard_normal((3 * C, C)) / np.sqrt(C)
        ).astype(np.float32)
        sd[f"{mha}.in_proj_bias"] = (rng.standard_normal(3 * C) * 0.05).astype(np.float32)
        lin(f"{mha}.out_proj", C, C)
        cma = f"{d}.attentions.1"
        lin(f"{cma}.sampling_offsets", C, H * 1 * cfg.num_points_decoder * 2, 0.1)
        lin(f"{cma}.attention_weights", C, H * 1 * cfg.num_points_decoder, 0.3)
        lin(f"{cma}.value_proj", C, C)
        lin(f"{cma}.output_proj", C, C)
        lin(f"{d}.ffns.0.layers.0.0", C, cfg.ffn_dims)
        lin(f"{d}.ffns.0.layers.1", cfg.ffn_dims, C)
        for n in range(3):
            ln(f"{d}.norms.{n}", C)

    for i in range(cfg.decoder_layers):
        c = f"pts_bbox_head.cls_branches.{i}"
        lin(f"{c}.0", C, C)
        ln(f"{c}.1", C)
        lin(f"{c}.3", C, C)
        ln(f"{c}.4", C)
        lin(f"{c}.6", C, cfg.num_classes)
        r = f"pts_bbox_head.reg_branches.{i}"
        lin(f"{r}.0", C, C)
        lin(f"{r}.2", C, C)
        lin(f"{r}.4", C, cfg.code_size, 0.1)
    return sd
