"""Import reference (mmdet/torch) BEVFormer checkpoints into the flax tree.

Maps the reference's state_dict layout (third_party/bev_mmdet3d model
naming: img_backbone.layer*.*, img_neck.{lateral_convs,fpn_convs},
pts_bbox_head.{transformer,cls_branches,reg_branches,...}) onto this
framework's parameter tree.  Conventions:

  torch Linear weight [out, in]      -> kernel [in, out] (transpose)
  torch Conv  weight [O, I, kh, kw]  -> kernel [kh, kw, I, O]
  BatchNorm weight/bias              -> FrozenBN scale/bias ("params")
  BatchNorm running_mean/var         -> "batch_stats" mean/var
  nn.MultiheadAttention in_proj      -> split q/k/v projections

Offset/weight projection feature layouts were verified against the
reference reshapes (temporal_self_attention.py:211-255 [H,Q,L,P,2];
spatial_cross_attention MSDA3D [H,L,P,2]) — identical ordering here, so
the Linear weights import without permutation.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _lin(sd, key):
    out = {"kernel": np.asarray(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _conv(sd, key):
    out = {"kernel": np.transpose(np.asarray(sd[f"{key}.weight"]), (2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _ln(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"]), "bias": np.asarray(sd[f"{key}.bias"])}


def _bn(sd, key):
    p = {"scale": np.asarray(sd[f"{key}.weight"]), "bias": np.asarray(sd[f"{key}.bias"])}
    s = {"mean": np.asarray(sd[f"{key}.running_mean"]), "var": np.asarray(sd[f"{key}.running_var"])}
    return p, s


def _import_resnet(sd, prefix: str, depth: int, dcn_stages=(False,) * 4):
    """mmcv ResNet state_dict slice ({prefix}.conv1/bn1/layer{1..4}) ->
    (params, batch_stats) for models.backbones.resnet.ResNet."""
    from ..models.backbones.resnet import BASIC_DEPTHS, STAGE_BLOCKS

    basic = depth in BASIC_DEPTHS
    bp: Dict[str, Any] = {}
    bs_: Dict[str, Any] = {}
    bp["stem_conv"] = _conv(sd, f"{prefix}.conv1")
    bp["stem_bn"], bs_["stem_bn"] = _bn(sd, f"{prefix}.bn1")
    for stage in range(4):
        for b in range(STAGE_BLOCKS[depth][stage]):
            src = f"{prefix}.layer{stage + 1}.{b}"
            dst = f"stage{stage}_block{b}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            p["conv1"] = _conv(sd, f"{src}.conv1")
            p["bn1"], s["bn1"] = _bn(sd, f"{src}.bn1")
            if dcn_stages[stage]:
                # mmcv DCN: conv2.weight + conv2.conv_offset
                p["conv2"] = {
                    "conv_offset": _conv(sd, f"{src}.conv2.conv_offset"),
                    "kernel": np.transpose(np.asarray(sd[f"{src}.conv2.weight"]), (2, 3, 1, 0)),
                }
            else:
                p["conv2"] = _conv(sd, f"{src}.conv2")
            p["bn2"], s["bn2"] = _bn(sd, f"{src}.bn2")
            if not basic:
                p["conv3"] = _conv(sd, f"{src}.conv3")
                p["bn3"], s["bn3"] = _bn(sd, f"{src}.bn3")
            if f"{src}.downsample.0.weight" in sd:
                p["downsample_conv"] = _conv(sd, f"{src}.downsample.0")
                p["downsample_bn"], s["downsample_bn"] = _bn(sd, f"{src}.downsample.1")
            bp[dst] = p
            bs_[dst] = s
    return bp, bs_


def import_bevformer_checkpoint(
    state_dict: Dict[str, Any],
    depth: int = 101,
    encoder_layers: int = 6,
    decoder_layers: int = 6,
    dcn_stages=(False, False, True, True),
) -> Dict[str, Any]:
    """Returns {"params": ..., "batch_stats": ...} for models.detectors.BEVFormer."""
    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # ---- backbone -------------------------------------------------------
    bp, bs_ = _import_resnet(sd, "img_backbone", depth, dcn_stages)
    params["img_backbone"] = bp
    stats["img_backbone"] = bs_

    # ---- FPN ------------------------------------------------------------
    neck: Dict[str, Any] = {}
    i = 0
    while f"img_neck.lateral_convs.{i}.conv.weight" in sd:
        neck[f"lateral{i}"] = _conv(sd, f"img_neck.lateral_convs.{i}.conv")
        i += 1
    i = 0
    while f"img_neck.fpn_convs.{i}.conv.weight" in sd:
        neck[f"fpn{i}"] = _conv(sd, f"img_neck.fpn_convs.{i}.conv")
        i += 1
    params["img_neck"] = neck

    # ---- head -----------------------------------------------------------
    hd: Dict[str, Any] = {}
    hd["bev_embedding"] = np.asarray(sd["pts_bbox_head.bev_embedding.weight"])
    hd["query_embedding"] = np.asarray(sd["pts_bbox_head.query_embedding.weight"])
    hd["positional_encoding"] = {
        "row_embed": np.asarray(sd["pts_bbox_head.positional_encoding.row_embed.weight"]),
        "col_embed": np.asarray(sd["pts_bbox_head.positional_encoding.col_embed.weight"]),
    }
    for i in range(decoder_layers):
        # ClsBranch: Linear(0) LN(1) Linear(3) LN(4) Linear(6)
        c = f"pts_bbox_head.cls_branches.{i}"
        hd[f"cls_branch{i}"] = {
            "fc1": _lin(sd, f"{c}.0"),
            "ln1": _ln(sd, f"{c}.1"),
            "fc2": _lin(sd, f"{c}.3"),
            "ln2": _ln(sd, f"{c}.4"),
            "out": _lin(sd, f"{c}.6"),
        }
        # RegBranch: Linear(0) ReLU Linear(2) ReLU Linear(4)
        r = f"pts_bbox_head.reg_branches.{i}"
        hd[f"reg_branch{i}"] = {
            "fc1": _lin(sd, f"{r}.0"),
            "fc2": _lin(sd, f"{r}.2"),
            "out": _lin(sd, f"{r}.4"),
        }

    # ---- transformer ----------------------------------------------------
    t = "pts_bbox_head.transformer"
    tr: Dict[str, Any] = {
        "cams_embeds": np.asarray(sd[f"{t}.cams_embeds"]),
        "level_embeds": np.asarray(sd[f"{t}.level_embeds"]),
        "reference_points": _lin(sd, f"{t}.reference_points"),
        "can_bus_fc1": _lin(sd, f"{t}.can_bus_mlp.0"),
        "can_bus_fc2": _lin(sd, f"{t}.can_bus_mlp.2"),
        "can_bus_norm": _ln(sd, f"{t}.can_bus_mlp.norm"),
    }

    enc: Dict[str, Any] = {}
    for i in range(encoder_layers):
        e = f"{t}.encoder.layers.{i}"
        layer: Dict[str, Any] = {}
        tsa = f"{e}.attentions.0"
        layer["self_attn"] = {
            "sampling_offsets": _lin(sd, f"{tsa}.sampling_offsets"),
            "attention_weights": _lin(sd, f"{tsa}.attention_weights"),
            "value_proj": _lin(sd, f"{tsa}.value_proj"),
            "output_proj": _lin(sd, f"{tsa}.output_proj"),
        }
        sca = f"{e}.attentions.1"
        layer["cross_attn"] = {
            "deformable_attention": {
                "sampling_offsets": _lin(sd, f"{sca}.deformable_attention.sampling_offsets"),
                "attention_weights": _lin(sd, f"{sca}.deformable_attention.attention_weights"),
                "value_proj": _lin(sd, f"{sca}.deformable_attention.value_proj"),
            },
            "output_proj": _lin(sd, f"{sca}.output_proj"),
        }
        layer["ffn"] = {
            "fc1": _lin(sd, f"{e}.ffns.0.layers.0.0"),
            "fc2": _lin(sd, f"{e}.ffns.0.layers.1"),
        }
        for n in range(3):
            layer[f"norm{n + 1}"] = _ln(sd, f"{e}.norms.{n}")
        enc[f"layer{i}"] = layer
    tr["encoder"] = enc

    dec: Dict[str, Any] = {}
    for i in range(decoder_layers):
        d = f"{t}.decoder.layers.{i}"
        layer = {}
        # nn.MultiheadAttention: in_proj [3C, C] -> q/k/v
        mha = f"{d}.attentions.0.attn"
        w = np.asarray(sd[f"{mha}.in_proj_weight"])
        b = np.asarray(sd[f"{mha}.in_proj_bias"])
        C = w.shape[1]
        layer["self_attn"] = {
            "q_proj": {"kernel": w[:C].T, "bias": b[:C]},
            "k_proj": {"kernel": w[C : 2 * C].T, "bias": b[C : 2 * C]},
            "v_proj": {"kernel": w[2 * C :].T, "bias": b[2 * C :]},
            "out_proj": _lin(sd, f"{mha}.out_proj"),
        }
        cma = f"{d}.attentions.1"
        layer["cross_attn"] = {
            "sampling_offsets": _lin(sd, f"{cma}.sampling_offsets"),
            "attention_weights": _lin(sd, f"{cma}.attention_weights"),
            "value_proj": _lin(sd, f"{cma}.value_proj"),
            "output_proj": _lin(sd, f"{cma}.output_proj"),
        }
        layer["ffn"] = {
            "fc1": _lin(sd, f"{d}.ffns.0.layers.0.0"),
            "fc2": _lin(sd, f"{d}.ffns.0.layers.1"),
        }
        for n in range(3):
            layer[f"norm{n + 1}"] = _ln(sd, f"{d}.norms.{n}")
        dec[f"layer{i}"] = layer
    tr["decoder"] = dec

    hd["transformer"] = tr
    params["pts_bbox_head"] = hd
    return {"params": params, "batch_stats": stats}


def import_bevdet_checkpoint(
    state_dict: Dict[str, Any],
    depth: int = 50,
    bev_stages: int = 3,
    bev_blocks: int = 2,
) -> Dict[str, Any]:
    """Reference BEVDet (third_party/bev_mmdet3d, configs/bevdet/
    bevdet-r50-cbgs.py) state_dict -> {"params", "batch_stats"} for
    models.detectors.BEVDet.

    Key map (reference module -> flax):
      img_backbone.{conv1,bn1,layer*}         -> img_backbone (mmcv ResNet)
      img_neck.lateral_convs.{i}.conv         -> img_neck.lateral{i}
      img_neck.fpn_convs.0.conv               -> img_neck.fpn0
      img_view_transformer.depth_net          -> img_view_transformer.depth_net
                                                 (bare nn.Conv2d, view_transformer.py:59)
      img_bev_encoder_backbone.layers.{s}.{b} -> stage{s}_block{b}
                                                 (CustomResNet BasicBlocks,
                                                 bev_resnet.py:59-83; downsample
                                                 is a bare 3x3 conv with bias)
      img_bev_encoder_neck.conv.{0,1,3,4}     -> conv1/bn1/conv2/bn2
      img_bev_encoder_neck.up2.{1,2,4}        -> up_conv/up_bn/out_conv
                                                 (FPN_LSS, lss_fpn.py:49-85)
      pts_bbox_head.shared_conv.{conv,bn}     -> shared_conv/shared_bn
      pts_bbox_head.task_heads.0.{h}.{0,1}    -> {h}.{conv1+bn1, conv2}
                                                 (SeparateHead final_kernel=3,
                                                 centerpoint_head.py:19-100)
    """
    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    bp, bs_ = _import_resnet(sd, "img_backbone", depth)
    params["img_backbone"] = bp
    stats["img_backbone"] = bs_

    neck: Dict[str, Any] = {}
    i = 0
    while f"img_neck.lateral_convs.{i}.conv.weight" in sd:
        neck[f"lateral{i}"] = _conv(sd, f"img_neck.lateral_convs.{i}.conv")
        i += 1
    neck["fpn0"] = _conv(sd, "img_neck.fpn_convs.0.conv")
    params["img_neck"] = neck

    params["img_view_transformer"] = {
        "depth_net": _conv(sd, "img_view_transformer.depth_net")
    }

    enc: Dict[str, Any] = {}
    es: Dict[str, Any] = {}
    for s in range(bev_stages):
        for b in range(bev_blocks):
            src = f"img_bev_encoder_backbone.layers.{s}.{b}"
            p: Dict[str, Any] = {}
            st: Dict[str, Any] = {}
            p["conv1"] = _conv(sd, f"{src}.conv1")
            p["bn1"], st["bn1"] = _bn(sd, f"{src}.bn1")
            p["conv2"] = _conv(sd, f"{src}.conv2")
            p["bn2"], st["bn2"] = _bn(sd, f"{src}.bn2")
            if f"{src}.downsample.weight" in sd:
                p["downsample_conv"] = _conv(sd, f"{src}.downsample")
            enc[f"stage{s}_block{b}"] = p
            es[f"stage{s}_block{b}"] = st
    params["img_bev_encoder_backbone"] = enc
    stats["img_bev_encoder_backbone"] = es

    nk: Dict[str, Any] = {}
    ns: Dict[str, Any] = {}
    nk["conv1"] = _conv(sd, "img_bev_encoder_neck.conv.0")
    nk["bn1"], ns["bn1"] = _bn(sd, "img_bev_encoder_neck.conv.1")
    nk["conv2"] = _conv(sd, "img_bev_encoder_neck.conv.3")
    nk["bn2"], ns["bn2"] = _bn(sd, "img_bev_encoder_neck.conv.4")
    nk["up_conv"] = _conv(sd, "img_bev_encoder_neck.up2.1")
    nk["up_bn"], ns["up_bn"] = _bn(sd, "img_bev_encoder_neck.up2.2")
    nk["out_conv"] = _conv(sd, "img_bev_encoder_neck.up2.4")
    params["img_bev_encoder_neck"] = nk
    stats["img_bev_encoder_neck"] = ns

    hd: Dict[str, Any] = {}
    hs: Dict[str, Any] = {}
    hd["shared_conv"] = _conv(sd, "pts_bbox_head.shared_conv.conv")
    hd["shared_bn"], hs["shared_bn"] = _bn(sd, "pts_bbox_head.shared_conv.bn")
    for h in ("reg", "height", "dim", "rot", "vel", "heatmap"):
        src = f"pts_bbox_head.task_heads.0.{h}"
        p = {
            "conv1": _conv(sd, f"{src}.0.conv"),
            "conv2": _conv(sd, f"{src}.1"),
        }
        bn_p, bn_s = _bn(sd, f"{src}.0.bn")
        p["bn1"] = bn_p
        hd[h] = p
        hs[h] = {"bn1": bn_s}
    params["pts_bbox_head"] = hd
    stats["pts_bbox_head"] = hs
    return {"params": params, "batch_stats": stats}


def _cm(sd, key):
    """mmcv ConvModule (conv bias-less + BN) -> (params, batch_stats) for
    csp_darknet.ConvModule / any conv+FrozenBN pair named conv/bn."""
    p = {"conv": _conv(sd, f"{key}.conv")}
    p["bn"], s = _bn(sd, f"{key}.bn")
    return p, {"bn": s}


def _csp(sd, key):
    """mmdet CSPLayer -> (params, batch_stats) for csp_darknet.CSPLayer."""
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    for sub in ("main_conv", "short_conv", "final_conv"):
        p[sub], s[sub] = _cm(sd, f"{key}.{sub}")
    k = 0
    while f"{key}.blocks.{k}.conv1.conv.weight" in sd:
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        bp["conv1"], bs["conv1"] = _cm(sd, f"{key}.blocks.{k}.conv1")
        bp["conv2"], bs["conv2"] = _cm(sd, f"{key}.blocks.{k}.conv2")
        p[f"block{k}"] = bp
        s[f"block{k}"] = bs
        k += 1
    return p, s


def import_yolox_checkpoint(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """mmdet YOLOX (configs/yolox/yolox_x_8x8_300e_coco.py) state_dict ->
    {"params", "batch_stats"} for models.detectors.YOLOX.

    Key map: backbone.stem/stage{1..4} (CSPDarknet: Sequential [down,
    (SPP), CSPLayer]), neck.{reduce_layers,top_down_blocks,downsamples,
    bottom_up_blocks,out_convs}.{k} (YOLOXPAFPN — our module names index
    the same lists), bbox_head.multi_level_{cls,reg}_convs.{lvl}.{i} +
    multi_level_conv_{cls,reg,obj}.{lvl}."""
    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    bp: Dict[str, Any] = {}
    bs_: Dict[str, Any] = {}
    stem_p, stem_s = _cm(sd, "backbone.stem.conv")
    bp["stem"] = {"conv": stem_p}
    bs_["stem"] = {"conv": stem_s}
    for i in range(1, 5):
        bp[f"stage{i}_down"], bs_[f"stage{i}_down"] = _cm(sd, f"backbone.stage{i}.0")
        if f"backbone.stage{i}.1.conv1.conv.weight" in sd:  # SPP present
            sp: Dict[str, Any] = {}
            ss: Dict[str, Any] = {}
            sp["conv1"], ss["conv1"] = _cm(sd, f"backbone.stage{i}.1.conv1")
            sp["conv2"], ss["conv2"] = _cm(sd, f"backbone.stage{i}.1.conv2")
            bp[f"stage{i}_spp"] = sp
            bs_[f"stage{i}_spp"] = ss
            csp_key = f"backbone.stage{i}.2"
        else:
            csp_key = f"backbone.stage{i}.1"
        bp[f"stage{i}_csp"], bs_[f"stage{i}_csp"] = _csp(sd, csp_key)
    params["backbone"] = bp
    stats["backbone"] = bs_

    np_: Dict[str, Any] = {}
    ns: Dict[str, Any] = {}
    k = 0
    while f"neck.reduce_layers.{k}.conv.weight" in sd:
        np_[f"reduce{k}"], ns[f"reduce{k}"] = _cm(sd, f"neck.reduce_layers.{k}")
        np_[f"td_csp{k}"], ns[f"td_csp{k}"] = _csp(sd, f"neck.top_down_blocks.{k}")
        k += 1
    k = 0
    while f"neck.downsamples.{k}.conv.weight" in sd:
        np_[f"down{k}"], ns[f"down{k}"] = _cm(sd, f"neck.downsamples.{k}")
        np_[f"bu_csp{k}"], ns[f"bu_csp{k}"] = _csp(sd, f"neck.bottom_up_blocks.{k}")
        k += 1
    k = 0
    while f"neck.out_convs.{k}.conv.weight" in sd:
        np_[f"out{k}"], ns[f"out{k}"] = _cm(sd, f"neck.out_convs.{k}")
        k += 1
    params["neck"] = np_
    stats["neck"] = ns

    hp: Dict[str, Any] = {}
    hs: Dict[str, Any] = {}
    lvl = 0
    while f"bbox_head.multi_level_conv_cls.{lvl}.weight" in sd:
        i = 0
        while f"bbox_head.multi_level_cls_convs.{lvl}.{i}.conv.weight" in sd:
            hp[f"l{lvl}_cls{i}"], hs[f"l{lvl}_cls{i}"] = _cm(
                sd, f"bbox_head.multi_level_cls_convs.{lvl}.{i}"
            )
            hp[f"l{lvl}_reg{i}"], hs[f"l{lvl}_reg{i}"] = _cm(
                sd, f"bbox_head.multi_level_reg_convs.{lvl}.{i}"
            )
            i += 1
        hp[f"l{lvl}_cls_out"] = _conv(sd, f"bbox_head.multi_level_conv_cls.{lvl}")
        hp[f"l{lvl}_reg_out"] = _conv(sd, f"bbox_head.multi_level_conv_reg.{lvl}")
        hp[f"l{lvl}_obj_out"] = _conv(sd, f"bbox_head.multi_level_conv_obj.{lvl}")
        lvl += 1
    params["bbox_head"] = hp
    stats["bbox_head"] = hs
    return {"params": params, "batch_stats": stats}


def import_centernet_checkpoint(
    state_dict: Dict[str, Any], depth: int = 18
) -> Dict[str, Any]:
    """mmdet CenterNet (centernet_resnet18_dcnv2_140e_coco) state_dict ->
    {"params", "batch_stats"} for models.detectors.CenterNet.

    Key map: backbone.* (mmcv R18 BasicBlocks), neck.deconv_layers.{2m}
    (ConvModule with DCNv2: conv.weight + conv.conv_offset) and .{2m+1}
    (deconv ConvModule: ConvTranspose2d + BN), bbox_head.{heatmap,wh,
    offset}_head.{0,2} (conv3x3+bias, ReLU, conv1x1)."""
    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    bp, bs_ = _import_resnet(sd, "backbone", depth)
    params["backbone"] = bp
    stats["backbone"] = bs_

    np_: Dict[str, Any] = {}
    ns: Dict[str, Any] = {}
    m = 0
    while f"neck.deconv_layers.{2 * m}.conv.weight" in sd:
        dk = f"neck.deconv_layers.{2 * m}"
        np_[f"dcn{m}"] = {
            "conv_offset": _conv(sd, f"{dk}.conv.conv_offset"),
            "kernel": np.transpose(np.asarray(sd[f"{dk}.conv.weight"]), (2, 3, 1, 0)),
        }
        np_[f"dcn_bn{m}"], ns[f"dcn_bn{m}"] = _bn(sd, f"{dk}.bn")
        uk = f"neck.deconv_layers.{2 * m + 1}"
        # torch ConvTranspose2d weight [in, out, kh, kw] -> flax ConvTranspose
        # kernel [kh, kw, in, out], spatially FLIPPED: lax.conv_transpose
        # correlates where torch's transposed conv convolves (see
        # tests/test_reference_parity.py centernet deconv oracle).
        w = np.asarray(sd[f"{uk}.conv.weight"])
        np_[f"deconv{m}"] = {
            "kernel": np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()
        }
        np_[f"deconv_bn{m}"], ns[f"deconv_bn{m}"] = _bn(sd, f"{uk}.bn")
        m += 1
    params["neck"] = np_
    stats["neck"] = ns

    hp: Dict[str, Any] = {}
    for name in ("heatmap", "wh", "offset"):
        hp[f"{name}_conv"] = _conv(sd, f"bbox_head.{name}_head.0")
        hp[f"{name}_out"] = _conv(sd, f"bbox_head.{name}_head.2")
    params["bbox_head"] = hp
    stats["bbox_head"] = {}
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str):
    """Load a .pth file (torch CPU) and return its flat state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def load_variables(path: str, template, family: str = "bevformer", cfg=None):
    """Checkpoint dispatch for the tools: a reference torch .pth runs
    through the family importer (the reference deployment entry — its
    published checkpoints load directly), anything else through the native
    msgpack loader.  Extra template collections (e.g. quant) are kept."""
    if str(path).endswith((".pth", ".pt")):
        sd = load_torch_checkpoint(path)
        if family == "bevformer":
            imported = import_bevformer_checkpoint(
                sd,
                depth=cfg.backbone_depth,
                encoder_layers=cfg.encoder_layers,
                decoder_layers=cfg.decoder_layers,
                dcn_stages=cfg.dcn_stages,
            )
        elif family == "bevdet":
            imported = import_bevdet_checkpoint(sd, depth=cfg.backbone_depth)
        elif family == "yolox":
            imported = import_yolox_checkpoint(sd)
        elif family == "centernet":
            imported = import_centernet_checkpoint(sd, depth=cfg.backbone_depth)
        else:
            raise ValueError(f"no torch importer for family {family!r}")
        return {**template, **imported}
    from .checkpoint import load_checkpoint

    # restore only the collections a training checkpoint actually stores —
    # a quant-instrumented model's init template also carries calibration
    # collections (amax_stats/hist_stats) that a params checkpoint lacks.
    # One read+parse: re-validate the already-parsed dict against the
    # sub-template instead of loading the file twice.
    import flax.serialization

    raw = load_checkpoint(path)
    sub_template = {k: v for k, v in template.items() if k in raw}
    restored = flax.serialization.from_state_dict(sub_template, raw)
    return {**template, **restored}
