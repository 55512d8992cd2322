"""2D-family checkpoint importers: structural (exact tree/shape match vs
model.init) and numerical parity vs torch oracles that follow the mmdet
forward math — YOLOX (CSPDarknet/PAFPN/head, full model) and CenterNet
(CTResNetNeck DCN+deconv + head)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
from flax import traverse_util

from bevformer_tensorrt_tpu.configs.yolox import yolox_micro
from bevformer_tensorrt_tpu.models.detectors.yolox import YOLOX
from bevformer_tensorrt_tpu.runtime.torch_import import (
    import_centernet_checkpoint,
    import_yolox_checkpoint,
)


def _shapes_match(init_vars, imported):
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


# ----------------------------------------------------------------- YOLOX ---
def synthetic_yolox_state_dict(cfg, rng):
    sd = {}

    def conv(key, i, o, k, bias=False):
        sd[f"{key}.weight"] = (rng.standard_normal((o, i, k, k)) * 0.15).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = (rng.standard_normal(o) * 0.1).astype(np.float32)

    def bn(key, c):
        sd[f"{key}.weight"] = (1.0 + 0.2 * rng.random(c)).astype(np.float32)
        sd[f"{key}.bias"] = (0.1 * rng.standard_normal(c)).astype(np.float32)
        sd[f"{key}.running_mean"] = (0.1 * rng.standard_normal(c)).astype(np.float32)
        sd[f"{key}.running_var"] = (1.0 + 0.3 * rng.random(c)).astype(np.float32)

    def cm(key, i, o, k):
        conv(f"{key}.conv", i, o, k)
        bn(f"{key}.bn", o)

    def csp(key, cin, cout, blocks):
        mid = cout // 2
        cm(f"{key}.main_conv", cin, mid, 1)
        cm(f"{key}.short_conv", cin, mid, 1)
        for b in range(blocks):
            cm(f"{key}.blocks.{b}.conv1", mid, mid, 1)
            cm(f"{key}.blocks.{b}.conv2", mid, mid, 3)
        cm(f"{key}.final_conv", 2 * mid, cout, 1)

    w = lambda c: int(c * cfg.widen_factor)
    d = lambda n: max(round(n * cfg.deepen_factor), 1)
    cm("backbone.stem.conv", 12, w(64), 3)
    prev = w(64)
    for i, (ch, n, spp) in enumerate(
        [(128, 3, False), (256, 9, False), (512, 9, False), (1024, 3, True)], start=1
    ):
        ch = w(ch)
        cm(f"backbone.stage{i}.0", prev, ch, 3)
        if spp:
            cm(f"backbone.stage{i}.1.conv1", ch, ch // 2, 1)
            cm(f"backbone.stage{i}.1.conv2", (ch // 2) * 4, ch, 1)
            csp(f"backbone.stage{i}.2", ch, ch, d(n))
        else:
            csp(f"backbone.stage{i}.1", ch, ch, d(n))
        prev = ch

    ins = [w(256), w(512), w(1024)]
    c = cfg.neck_channels
    nb = cfg.num_csp_blocks
    cm("neck.reduce_layers.0", ins[2], ins[1], 1)
    csp("neck.top_down_blocks.0", 2 * ins[1], ins[1], nb)
    cm("neck.reduce_layers.1", ins[1], ins[0], 1)
    csp("neck.top_down_blocks.1", 2 * ins[0], ins[0], nb)
    cm("neck.downsamples.0", ins[0], ins[0], 3)
    csp("neck.bottom_up_blocks.0", 2 * ins[0], ins[1], nb)
    cm("neck.downsamples.1", ins[1], ins[1], 3)
    csp("neck.bottom_up_blocks.1", 2 * ins[1], ins[2], nb)
    for k, cin in enumerate(ins):
        cm(f"neck.out_convs.{k}", cin, c, 1)

    for lvl in range(3):
        for i in range(2):
            cm(f"bbox_head.multi_level_cls_convs.{lvl}.{i}", c, c, 3)
            cm(f"bbox_head.multi_level_reg_convs.{lvl}.{i}", c, c, 3)
        conv(f"bbox_head.multi_level_conv_cls.{lvl}", c, cfg.num_classes, 1, bias=True)
        conv(f"bbox_head.multi_level_conv_reg.{lvl}", c, 4, 1, bias=True)
        conv(f"bbox_head.multi_level_conv_obj.{lvl}", c, 1, 1, bias=True)
    return sd


def _bn_t(t, sd, k, eps=1e-5):
    m = torch.from_numpy(sd[f"{k}.running_mean"])
    v = torch.from_numpy(sd[f"{k}.running_var"])
    return (t - m[None, :, None, None]) / torch.sqrt(v[None, :, None, None] + eps) * \
        torch.from_numpy(sd[f"{k}.weight"])[None, :, None, None] + \
        torch.from_numpy(sd[f"{k}.bias"])[None, :, None, None]


def _cm_t(x, sd, k, stride=1, pad=0):
    x = F.conv2d(x, torch.from_numpy(sd[f"{k}.conv.weight"]), stride=stride, padding=pad)
    return F.silu(_bn_t(x, sd, f"{k}.bn"))


def _csp_t(x, sd, k, add_identity):
    main = _cm_t(x, sd, f"{k}.main_conv")
    short = _cm_t(x, sd, f"{k}.short_conv")
    b = 0
    while f"{k}.blocks.{b}.conv1.conv.weight" in sd:
        y = _cm_t(main, sd, f"{k}.blocks.{b}.conv1")
        y = _cm_t(y, sd, f"{k}.blocks.{b}.conv2", pad=1)
        main = main + y if add_identity else y
        b += 1
    return _cm_t(torch.cat([main, short], 1), sd, f"{k}.final_conv")


def torch_yolox_oracle(sd, x):
    """mmdet YOLOX forward on a raw state_dict (CSPDarknet P5 arch +
    YOLOXPAFPN + YOLOXHead, silu activations, nearest upsample)."""
    p = torch.cat(
        [x[:, :, ::2, ::2], x[:, :, 1::2, ::2], x[:, :, ::2, 1::2], x[:, :, 1::2, 1::2]], 1
    )
    cur = _cm_t(p, sd, "backbone.stem.conv", pad=1)
    feats = []
    for i in range(1, 5):
        cur = _cm_t(cur, sd, f"backbone.stage{i}.0", stride=2, pad=1)
        if f"backbone.stage{i}.1.conv1.conv.weight" in sd:
            y = _cm_t(cur, sd, f"backbone.stage{i}.1.conv1")
            pools = [y] + [
                F.max_pool2d(y, ks, stride=1, padding=ks // 2) for ks in (5, 9, 13)
            ]
            cur = _cm_t(torch.cat(pools, 1), sd, f"backbone.stage{i}.1.conv2")
            cur = _csp_t(cur, sd, f"backbone.stage{i}.2", add_identity=False)
        else:
            cur = _csp_t(cur, sd, f"backbone.stage{i}.1", add_identity=True)
        if i >= 2:
            feats.append(cur)
    inner = [feats[-1]]
    n = 3
    for idx in range(n - 1, 0, -1):
        k = n - 1 - idx
        high = _cm_t(inner[0], sd, f"neck.reduce_layers.{k}")
        inner[0] = high
        up = F.interpolate(high, scale_factor=2, mode="nearest")
        inner.insert(
            0, _csp_t(torch.cat([up, feats[idx - 1]], 1), sd, f"neck.top_down_blocks.{k}", False)
        )
    outs = [inner[0]]
    for k in range(n - 1):
        down = _cm_t(outs[k], sd, f"neck.downsamples.{k}", stride=2, pad=1)
        outs.append(
            _csp_t(torch.cat([down, inner[k + 1]], 1), sd, f"neck.bottom_up_blocks.{k}", False)
        )
    outs = [_cm_t(o, sd, f"neck.out_convs.{i}") for i, o in enumerate(outs)]
    res = []
    for lvl, o in enumerate(outs):
        cf, rf = o, o
        for i in range(2):
            cf = _cm_t(cf, sd, f"bbox_head.multi_level_cls_convs.{lvl}.{i}", pad=1)
            rf = _cm_t(rf, sd, f"bbox_head.multi_level_reg_convs.{lvl}.{i}", pad=1)
        res.append({
            "cls": F.conv2d(cf, torch.from_numpy(sd[f"bbox_head.multi_level_conv_cls.{lvl}.weight"]),
                            torch.from_numpy(sd[f"bbox_head.multi_level_conv_cls.{lvl}.bias"])),
            "reg": F.conv2d(rf, torch.from_numpy(sd[f"bbox_head.multi_level_conv_reg.{lvl}.weight"]),
                            torch.from_numpy(sd[f"bbox_head.multi_level_conv_reg.{lvl}.bias"])),
            "obj": F.conv2d(rf, torch.from_numpy(sd[f"bbox_head.multi_level_conv_obj.{lvl}.weight"]),
                            torch.from_numpy(sd[f"bbox_head.multi_level_conv_obj.{lvl}.bias"])),
        })
    return res


def test_yolox_import_structural_and_parity(rng):
    cfg = yolox_micro()
    model = YOLOX(cfg)
    img = jnp.zeros((1, 3, cfg.img_size, cfg.img_size), jnp.float32)
    init_vars = jax.eval_shape(model.init, jax.random.PRNGKey(0), img)
    sd = synthetic_yolox_state_dict(cfg, np.random.default_rng(3))
    imported = import_yolox_checkpoint(sd)
    _shapes_match(init_vars, imported)

    x = rng.standard_normal((1, 3, cfg.img_size, cfg.img_size)).astype(np.float32)
    ref = torch_yolox_oracle(sd, torch.from_numpy(x))
    outs = YOLOX(cfg).apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]},
        jnp.asarray(x),
    )
    for lvl in range(3):
        for k in ("cls", "reg", "obj"):
            ours = np.asarray(outs[lvl][k])[0].transpose(2, 0, 1)
            r = ref[lvl][k].numpy()[0]
            rel = np.abs(ours - r).max() / (np.abs(r).max() + 1e-9)
            assert rel < 2e-4, (lvl, k, rel)


# -------------------------------------------------------------- CenterNet ---
def synthetic_centernet_state_dict(cfg, rng, filters=(16, 8, 8)):
    sd = {}

    def conv(key, i, o, k, bias=False):
        sd[f"{key}.weight"] = (rng.standard_normal((o, i, k, k)) * 0.15).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = (rng.standard_normal(o) * 0.1).astype(np.float32)

    def bn(key, c):
        sd[f"{key}.weight"] = (1.0 + 0.2 * rng.random(c)).astype(np.float32)
        sd[f"{key}.bias"] = (0.1 * rng.standard_normal(c)).astype(np.float32)
        sd[f"{key}.running_mean"] = (0.1 * rng.standard_normal(c)).astype(np.float32)
        sd[f"{key}.running_var"] = (1.0 + 0.3 * rng.random(c)).astype(np.float32)

    # mmcv R18
    conv("backbone.conv1", 3, 64, 7)
    bn("backbone.bn1", 64)
    planes = 64
    from bevformer_tensorrt_tpu.models.backbones.resnet import STAGE_BLOCKS

    for stage in range(4):
        for b in range(STAGE_BLOCKS[18][stage]):
            src = f"backbone.layer{stage + 1}.{b}"
            cin = (64 if stage == 0 else planes // 2) if b == 0 else planes
            conv(f"{src}.conv1", cin, planes, 3)
            bn(f"{src}.bn1", planes)
            conv(f"{src}.conv2", planes, planes, 3)
            bn(f"{src}.bn2", planes)
            if b == 0 and stage > 0:
                conv(f"{src}.downsample.0", cin, planes, 1)
                bn(f"{src}.downsample.1", planes)
        planes *= 2

    # CTResNetNeck: [ConvModule(DCNv2), ConvModule(deconv)] x3
    cin = 512
    for m, ch in enumerate(filters):
        dk = f"neck.deconv_layers.{2 * m}"
        conv(f"{dk}.conv", cin, ch, 3)
        conv(f"{dk}.conv.conv_offset", cin, 27, 3, bias=True)
        # sub-pixel offsets: bilinear sampling at multi-pixel random
        # offsets is chaotic (a 1e-5 upstream delta flips corner cells),
        # which would make the parity threshold meaningless
        sd[f"{dk}.conv.conv_offset.weight"] *= 0.02
        sd[f"{dk}.conv.conv_offset.bias"] *= 0.02
        bn(f"{dk}.bn", ch)
        uk = f"neck.deconv_layers.{2 * m + 1}"
        sd[f"{uk}.conv.weight"] = (rng.standard_normal((ch, ch, 4, 4)) * 0.15).astype(np.float32)
        bn(f"{uk}.bn", ch)
        cin = ch

    fc = filters[-1]
    for name, ch in [("heatmap", cfg.num_classes), ("wh", 2), ("offset", 2)]:
        conv(f"bbox_head.{name}_head.0", fc, fc, 3, bias=True)
        conv(f"bbox_head.{name}_head.2", fc, ch, 1, bias=True)
    return sd


def test_centernet_import_structural_and_neck_parity(rng):
    from bevformer_tensorrt_tpu.configs.centernet import centernet_r18
    from bevformer_tensorrt_tpu.models.detectors.centernet import CenterNet
    from bevformer_tensorrt_tpu.models.heads.centernet_head import CenterNetHead
    from bevformer_tensorrt_tpu.models.necks.ct_resnet_neck import CTResNetNeck
    from test_ops_misc import numpy_dcn_oracle

    cfg = centernet_r18()
    filters = tuple(cfg.deconv_filters)
    sd = synthetic_centernet_state_dict(cfg, np.random.default_rng(5), filters)
    imported = import_centernet_checkpoint(sd, depth=cfg.backbone_depth)

    model = CenterNet(cfg)
    init_vars = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 3, cfg.img_size, cfg.img_size), jnp.float32),
    )
    _shapes_match(init_vars, imported)

    # neck + head numerical parity (mmcv DCNv2 + torch deconv oracle)
    H = W = 8
    x = rng.standard_normal((1, 512, H, W)).astype(np.float32)
    cur = torch.from_numpy(x)
    for m in range(len(filters)):
        dk = f"neck.deconv_layers.{2 * m}"
        off_out = F.conv2d(
            cur, torch.from_numpy(sd[f"{dk}.conv.conv_offset.weight"]),
            torch.from_numpy(sd[f"{dk}.conv.conv_offset.bias"]), padding=1,
        )
        offset = off_out[:, :18].numpy()
        mask = torch.sigmoid(off_out[:, 18:]).numpy()
        cur = torch.from_numpy(
            numpy_dcn_oracle(
                cur.numpy(), offset, mask, sd[f"{dk}.conv.weight"], None, 1, 1, 1, 1, 1
            ).astype(np.float32)
        )
        cur = F.relu(_bn_t(cur, sd, f"{dk}.bn"))
        uk = f"neck.deconv_layers.{2 * m + 1}"
        cur = F.conv_transpose2d(
            cur, torch.from_numpy(sd[f"{uk}.conv.weight"]), stride=2, padding=1
        )
        cur = F.relu(_bn_t(cur, sd, f"{uk}.bn"))
    torch_heads = {}
    for name in ("heatmap", "wh", "offset"):
        t = F.relu(F.conv2d(cur, torch.from_numpy(sd[f"bbox_head.{name}_head.0.weight"]),
                            torch.from_numpy(sd[f"bbox_head.{name}_head.0.bias"]), padding=1))
        torch_heads[name] = F.conv2d(
            t, torch.from_numpy(sd[f"bbox_head.{name}_head.2.weight"]),
            torch.from_numpy(sd[f"bbox_head.{name}_head.2.bias"]),
        )

    neck = CTResNetNeck(num_deconv_filters=filters)
    bev = neck.apply(
        {"params": imported["params"]["neck"], "batch_stats": imported["batch_stats"]["neck"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    head = CenterNetHead(num_classes=cfg.num_classes, feat_channels=filters[-1])
    heads_j = head.apply({"params": imported["params"]["bbox_head"]}, bev)
    for name, tv in torch_heads.items():
        ours = np.asarray(heads_j[name])[0].transpose(2, 0, 1)
        r = tv.numpy()[0]
        rel = np.abs(ours - r).max() / (np.abs(r).max() + 1e-9)
        assert rel < 2e-4, (name, rel)
