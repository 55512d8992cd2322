"""Structural test for the torch checkpoint importer: a synthetic
state_dict with the reference's key layout must import into exactly the
flax tree that model.init produces (same paths, same shapes)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import traverse_util

from bevformer_tensorrt_tpu.configs.bevformer import bevformer_micro
from bevformer_tensorrt_tpu.models.backbones.resnet import STAGE_BLOCKS
from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer
from bevformer_tensorrt_tpu.runtime.torch_import import import_bevformer_checkpoint


def synthetic_state_dict(cfg, rng):
    """Reference-layout state_dict with shapes matching cfg."""
    sd = {}
    C = cfg.embed_dims

    def lin(key, i, o, bias=True):
        sd[f"{key}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = rng.standard_normal(o).astype(np.float32)

    def conv(key, i, o, k, bias=False):
        sd[f"{key}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = rng.standard_normal(o).astype(np.float32)

    def bn(key, c):
        for n, v in [("weight", 1.0), ("bias", 0.0), ("running_mean", 0.0), ("running_var", 1.0)]:
            sd[f"{key}.{n}"] = np.full(c, v, np.float32)

    def ln(key, c):
        sd[f"{key}.weight"] = np.ones(c, np.float32)
        sd[f"{key}.bias"] = np.zeros(c, np.float32)

    conv("img_backbone.conv1", 3, 64, 7)
    bn("img_backbone.bn1", 64)
    planes = 64
    for stage in range(4):
        for b in range(STAGE_BLOCKS[cfg.backbone_depth][stage]):
            src = f"img_backbone.layer{stage + 1}.{b}"
            cin = planes * 4 // (1 if b else (2 if stage else 1))
            if b == 0:
                cin = 64 if stage == 0 else planes * 2
            else:
                cin = planes * 4
            conv(f"{src}.conv1", cin, planes, 1)
            bn(f"{src}.bn1", planes)
            conv(f"{src}.conv2", planes, planes, 3)
            bn(f"{src}.bn2", planes)
            conv(f"{src}.conv3", planes, planes * 4, 1)
            bn(f"{src}.bn3", planes * 4)
            if b == 0:
                conv(f"{src}.downsample.0", cin, planes * 4, 1)
                bn(f"{src}.downsample.1", planes * 4)
        planes *= 2

    # FPN: single input level (2048) -> num_levels outputs
    lateral_in = [2048]
    for i, cin in enumerate(lateral_in):
        conv(f"img_neck.lateral_convs.{i}.conv", cin, C, 1, bias=True)
    for i in range(cfg.num_levels):
        conv(f"img_neck.fpn_convs.{i}.conv", C, C, 3, bias=True)

    hd = "pts_bbox_head"
    sd[f"{hd}.bev_embedding.weight"] = rng.standard_normal(
        (cfg.bev_h * cfg.bev_w, C)
    ).astype(np.float32)
    sd[f"{hd}.query_embedding.weight"] = rng.standard_normal(
        (cfg.num_query, 2 * C)
    ).astype(np.float32)
    sd[f"{hd}.positional_encoding.row_embed.weight"] = rng.standard_normal(
        (cfg.bev_h, C // 2)
    ).astype(np.float32)
    sd[f"{hd}.positional_encoding.col_embed.weight"] = rng.standard_normal(
        (cfg.bev_w, C // 2)
    ).astype(np.float32)
    for i in range(cfg.decoder_layers):
        lin(f"{hd}.cls_branches.{i}.0", C, C)
        ln(f"{hd}.cls_branches.{i}.1", C)
        lin(f"{hd}.cls_branches.{i}.3", C, C)
        ln(f"{hd}.cls_branches.{i}.4", C)
        lin(f"{hd}.cls_branches.{i}.6", C, cfg.num_classes)
        lin(f"{hd}.reg_branches.{i}.0", C, C)
        lin(f"{hd}.reg_branches.{i}.2", C, C)
        lin(f"{hd}.reg_branches.{i}.4", C, cfg.code_size)

    t = f"{hd}.transformer"
    sd[f"{t}.cams_embeds"] = rng.standard_normal((cfg.num_cams, C)).astype(np.float32)
    sd[f"{t}.level_embeds"] = rng.standard_normal((cfg.num_levels, C)).astype(np.float32)
    lin(f"{t}.reference_points", C, 3)
    lin(f"{t}.can_bus_mlp.0", cfg.can_bus_dims, C // 2)
    lin(f"{t}.can_bus_mlp.2", C // 2, C)
    ln(f"{t}.can_bus_mlp.norm", C)

    H, L = cfg.num_heads, cfg.num_levels
    for i in range(cfg.encoder_layers):
        e = f"{t}.encoder.layers.{i}"
        P = cfg.num_points_self
        lin(f"{e}.attentions.0.sampling_offsets", 2 * C, H * 2 * 1 * P * 2)
        lin(f"{e}.attentions.0.attention_weights", 2 * C, H * 2 * 1 * P)
        lin(f"{e}.attentions.0.value_proj", C, C)
        lin(f"{e}.attentions.0.output_proj", C, C)
        P = cfg.num_points_cross
        lin(f"{e}.attentions.1.deformable_attention.sampling_offsets", C, H * L * P * 2)
        lin(f"{e}.attentions.1.deformable_attention.attention_weights", C, H * L * P)
        lin(f"{e}.attentions.1.deformable_attention.value_proj", C, C)
        lin(f"{e}.attentions.1.output_proj", C, C)
        lin(f"{e}.ffns.0.layers.0.0", C, cfg.ffn_dims)
        lin(f"{e}.ffns.0.layers.1", cfg.ffn_dims, C)
        for n in range(3):
            ln(f"{e}.norms.{n}", C)
    for i in range(cfg.decoder_layers):
        d = f"{t}.decoder.layers.{i}"
        sd[f"{d}.attentions.0.attn.in_proj_weight"] = rng.standard_normal(
            (3 * C, C)
        ).astype(np.float32)
        sd[f"{d}.attentions.0.attn.in_proj_bias"] = rng.standard_normal(3 * C).astype(np.float32)
        lin(f"{d}.attentions.0.attn.out_proj", C, C)
        P = cfg.num_points_decoder
        lin(f"{d}.attentions.1.sampling_offsets", C, H * 1 * P * 2)
        lin(f"{d}.attentions.1.attention_weights", C, H * 1 * P)
        lin(f"{d}.attentions.1.value_proj", C, C)
        lin(f"{d}.attentions.1.output_proj", C, C)
        lin(f"{d}.ffns.0.layers.0.0", C, cfg.ffn_dims)
        lin(f"{d}.ffns.0.layers.1", cfg.ffn_dims, C)
        for n in range(3):
            ln(f"{d}.norms.{n}", C)
    return sd


@pytest.mark.slow
def test_import_matches_init_tree(rng):
    cfg = bevformer_micro()
    model = BEVFormer(cfg)
    nq = cfg.bev_h * cfg.bev_w
    init_vars = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.num_cams, 3, cfg.img_h, cfg.img_w), jnp.float32),
        jnp.zeros((nq, 1, cfg.embed_dims), jnp.float32),
        jnp.float32(0.0),
        jnp.zeros(cfg.can_bus_dims, jnp.float32),
        jnp.zeros((1, cfg.num_cams, 4, 4), jnp.float32),
    )
    sd = synthetic_state_dict(cfg, rng)
    imported = import_bevformer_checkpoint(
        sd,
        depth=cfg.backbone_depth,
        encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        dcn_stages=cfg.dcn_stages,
    )
    for col in ("params", "batch_stats"):
        want = {
            "/".join(k): v.shape
            for k, v in traverse_util.flatten_dict(init_vars[col]).items()
        }
        got = {
            "/".join(k): np.asarray(v).shape
            for k, v in traverse_util.flatten_dict(imported[col]).items()
        }
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        assert not missing, f"{col} missing: {missing[:8]}"
        assert not extra, f"{col} extra: {extra[:8]}"
        for k in want:
            assert want[k] == got[k], (k, want[k], got[k])


def synthetic_bevdet_state_dict(cfg, rng):
    """Reference-layout BEVDet state_dict (bevdet-r50-cbgs naming) with
    shapes matching cfg."""
    sd = {}

    def conv(key, i, o, k, bias=False):
        sd[f"{key}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = rng.standard_normal(o).astype(np.float32)

    def bn(key, c):
        for n, v in [("weight", 1.0), ("bias", 0.0), ("running_mean", 0.0), ("running_var", 1.0)]:
            sd[f"{key}.{n}"] = np.full(c, v, np.float32)

    # mmcv R50 backbone
    conv("img_backbone.conv1", 3, 64, 7)
    bn("img_backbone.bn1", 64)
    planes = 64
    for stage in range(4):
        for b in range(STAGE_BLOCKS[cfg.backbone_depth][stage]):
            src = f"img_backbone.layer{stage + 1}.{b}"
            cin = (64 if stage == 0 else planes * 2) if b == 0 else planes * 4
            conv(f"{src}.conv1", cin, planes, 1)
            bn(f"{src}.bn1", planes)
            conv(f"{src}.conv2", planes, planes, 3)
            bn(f"{src}.bn2", planes)
            conv(f"{src}.conv3", planes, planes * 4, 1)
            bn(f"{src}.bn3", planes * 4)
            if b == 0:
                conv(f"{src}.downsample.0", cin, planes * 4, 1)
                bn(f"{src}.downsample.1", planes * 4)
        planes *= 2

    # CustomFPN over (c4, c5)
    oc = cfg.neck_out_channels
    conv("img_neck.lateral_convs.0.conv", 1024, oc, 1, bias=True)
    conv("img_neck.lateral_convs.1.conv", 2048, oc, 1, bias=True)
    conv("img_neck.fpn_convs.0.conv", oc, oc, 3, bias=True)

    # LSS depth net: bare conv -> D + view_channels
    conv("img_view_transformer.depth_net", oc, cfg.depth_bins + cfg.view_channels, 1, bias=True)

    # CustomResNet BEV encoder (BasicBlocks, bare-conv downsample)
    cin = cfg.view_channels
    for s, ch in enumerate(cfg.bev_channels):
        for b in range(2):
            src = f"img_bev_encoder_backbone.layers.{s}.{b}"
            conv(f"{src}.conv1", cin if b == 0 else ch, ch, 3)
            bn(f"{src}.bn1", ch)
            conv(f"{src}.conv2", ch, ch, 3)
            bn(f"{src}.bn2", ch)
            if b == 0:
                conv(f"{src}.downsample", cin, ch, 3, bias=True)
        cin = ch

    # FPN_LSS
    co = cfg.bev_out_channels
    fin = cfg.bev_channels[0] + cfg.bev_channels[2]
    conv("img_bev_encoder_neck.conv.0", fin, co * 2, 3)
    bn("img_bev_encoder_neck.conv.1", co * 2)
    conv("img_bev_encoder_neck.conv.3", co * 2, co * 2, 3)
    bn("img_bev_encoder_neck.conv.4", co * 2)
    conv("img_bev_encoder_neck.up2.1", co * 2, co, 3)
    bn("img_bev_encoder_neck.up2.2", co)
    conv("img_bev_encoder_neck.up2.4", co, co, 1, bias=True)

    # CenterHead
    sc = cfg.share_conv_channel
    conv("pts_bbox_head.shared_conv.conv", co, sc, 3)
    bn("pts_bbox_head.shared_conv.bn", sc)
    for h, ch in [("reg", 2), ("height", 1), ("dim", 3), ("rot", 2), ("vel", 2), ("heatmap", cfg.num_classes)]:
        src = f"pts_bbox_head.task_heads.0.{h}"
        conv(f"{src}.0.conv", sc, sc, 3)
        bn(f"{src}.0.bn", sc)
        conv(f"{src}.1", sc, ch, 3, bias=True)
    return sd


def test_bevdet_import_matches_init_tree(rng):
    from bevformer_tensorrt_tpu.configs.bevdet import bevdet_micro
    from bevformer_tensorrt_tpu.models.detectors.bevdet import BEVDet
    from bevformer_tensorrt_tpu.runtime.torch_import import import_bevdet_checkpoint

    cfg = bevdet_micro()
    model = BEVDet(cfg)
    P = 512
    init_vars = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.num_cams, 3, cfg.input_h, cfg.input_w), jnp.float32),
        jnp.zeros(P, jnp.int32),
        jnp.zeros(P, jnp.int32),
        jnp.zeros(P, jnp.int32),
    )
    sd = synthetic_bevdet_state_dict(cfg, rng)
    imported = import_bevdet_checkpoint(sd, depth=cfg.backbone_depth)
    for col in ("params", "batch_stats"):
        want = {
            "/".join(k): v.shape
            for k, v in traverse_util.flatten_dict(init_vars[col]).items()
        }
        got = {
            "/".join(k): np.asarray(v).shape
            for k, v in traverse_util.flatten_dict(imported[col]).items()
        }
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        assert not missing, f"{col} missing: {missing[:8]}"
        assert not extra, f"{col} extra: {extra[:8]}"
        for k in want:
            assert want[k] == got[k], (k, want[k], got[k])
