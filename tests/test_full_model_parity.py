"""Whole-detector import parity (VERDICT r2 item 2): a reference-layout
state_dict is imported via runtime/torch_import.py and the flax detector's
END-TO-END forward is diffed against a torch oracle composed from the
reference's own forward chain (tests/bevformer_torch_oracle.py, every step
cited to the reference source).  Catches wiring bugs no module-level test
reaches: feature flatten order, embeddings, shift/rotate plumbing, layer
stacking, branch indexing, box decode — over TWO frames including the
temporal (use_prev_bev=1) second frame.

YOLOX has the same style of full-model test in tests/test_import_2d.py;
BEVDet/CenterNet full compositions live here too.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from bevformer_torch_oracle import (
    synthetic_bevformer_state_dict,
    torch_bevformer_forward,
    torch_resnet,
)


def _rel(a, b):
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


def micro_rig(cfg, rng):
    """Plausible perspective rig at the micro image size: cameras at
    distinct yaws, focal ~ img_w."""
    l2i = []
    for c in range(cfg.num_cams):
        yaw = 2 * np.pi * c / cfg.num_cams
        rot = np.array(
            [
                [np.cos(yaw), -np.sin(yaw), 0],
                [np.sin(yaw), np.cos(yaw), 0],
                [0, 0, 1],
            ]
        ) @ np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]])
        ext = np.eye(4)
        ext[:3, :3] = rot.T
        ext[:3, 3] = rng.normal(0, 0.2, 3)
        K = np.eye(4)
        K[0, 0] = K[1, 1] = cfg.img_w * 0.8
        K[0, 2] = cfg.img_w / 2
        K[1, 2] = cfg.img_h / 2
        l2i.append(K @ ext)
    return np.stack(l2i).astype(np.float32).reshape(1, cfg.num_cams, 4, 4)


@pytest.mark.slow
def test_full_model_bevformer_parity(rng):
    """Reference .pth-layout weights -> import -> flax forward == torch
    oracle forward, two frames incl. temporal recurrence.  Match:
    det2trt/models/detector/bevformer.py:37-55 forward contract."""
    from bevformer_tensorrt_tpu.configs.bevformer import bevformer_micro
    from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer
    from bevformer_tensorrt_tpu.runtime.torch_import import import_bevformer_checkpoint

    cfg = bevformer_micro(cam_budget=1.0, msda_impl="jnp")
    sd = synthetic_bevformer_state_dict(cfg, np.random.default_rng(11))
    imported = import_bevformer_checkpoint(
        sd,
        depth=cfg.backbone_depth,
        encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        dcn_stages=cfg.dcn_stages,
    )

    model = BEVFormer(cfg)
    nq = cfg.bev_h * cfg.bev_w
    l2i = micro_rig(cfg, rng)
    image1 = rng.standard_normal((1, cfg.num_cams, 3, cfg.img_h, cfg.img_w)).astype(np.float32)
    image2 = rng.standard_normal((1, cfg.num_cams, 3, cfg.img_h, cfg.img_w)).astype(np.float32)
    can_bus1 = np.zeros(cfg.can_bus_dims, np.float32)
    can_bus2 = rng.standard_normal(cfg.can_bus_dims).astype(np.float32) * 0.5
    prev0 = np.zeros((nq, 1, cfg.embed_dims), np.float32)

    apply_fn = jax.jit(
        lambda v, *a: model.apply(v, *a)
    )
    variables = {"params": imported["params"], "batch_stats": imported["batch_stats"]}

    # frame 1: no history
    with torch.no_grad():
        ref1 = torch_bevformer_forward(sd, cfg, image1, prev0, 0.0, can_bus1, l2i)
    got1 = apply_fn(
        variables, jnp.asarray(image1), jnp.asarray(prev0), jnp.float32(0.0),
        jnp.asarray(can_bus1), jnp.asarray(l2i),
    )
    for name, g, r in zip(("bev_embed", "classes", "coords"), got1, ref1):
        rel = _rel(np.asarray(g), r.numpy())
        assert rel < 1e-4, (name, rel)

    # frame 2: temporal — prev_bev from frame 1 (each side carries its own)
    with torch.no_grad():
        ref2 = torch_bevformer_forward(
            sd, cfg, image2, ref1[0].numpy(), 1.0, can_bus2, l2i
        )
    got2 = apply_fn(
        variables, jnp.asarray(image2), got1[0], jnp.float32(1.0),
        jnp.asarray(can_bus2), jnp.asarray(l2i),
    )
    for name, g, r in zip(("bev_embed", "classes", "coords"), got2, ref2):
        rel = _rel(np.asarray(g), r.numpy())
        assert rel < 1e-4, ("frame2/" + name, rel)
    # the temporal frame must actually differ from a no-history forward of
    # the same image (guards against a silent use_prev_bev=0 wiring)
    got2b = apply_fn(
        variables, jnp.asarray(image2), got1[0], jnp.float32(0.0),
        jnp.asarray(can_bus2), jnp.asarray(l2i),
    )
    assert np.abs(np.asarray(got2[0]) - np.asarray(got2b[0])).max() > 1e-4


def test_backbone_r101_dcn_caffe_parity(rng):
    """R101-DCN caffe-style backbone (base/small tier) through the importer
    vs a torch+numpy-DCN oracle — the backbone variant the micro e2e test
    cannot reach.  Truncated to the first blocks of each stage via a
    synthetic sd that only the oracle and importer consume equally would
    change STAGE_BLOCKS, so this runs the REAL R101 depth at a small image.
    Match: mmcv ResNet caffe style (stride on conv1) + mmcv
    ModulatedDeformConv2dPack (det2trt/models/modules/cnn/dcn.py)."""
    from bevformer_tensorrt_tpu.configs.bevformer import bevformer_micro
    from bevformer_tensorrt_tpu.models.backbones.resnet import ResNet
    from bevformer_tensorrt_tpu.runtime.torch_import import _import_resnet
    from bevformer_torch_oracle import synthetic_bevformer_state_dict
    from test_ops_misc import numpy_dcn_oracle

    cfg = bevformer_micro(backbone_depth=101, dcn_stages=(False, False, True, True))
    sd = {
        k: v
        for k, v in synthetic_bevformer_state_dict(
            cfg, np.random.default_rng(13)
        ).items()
        if k.startswith("img_backbone")
    }
    params, stats = _import_resnet(sd, "img_backbone", 101, cfg.dcn_stages)

    x = rng.standard_normal((1, 3, 64, 96)).astype(np.float32)

    # torch oracle with numpy DCN for the dcn stages
    from bevformer_tensorrt_tpu.models.backbones.resnet import STAGE_BLOCKS
    from bevformer_torch_oracle import _bn, _conv_bn_relu, _w

    t = torch.from_numpy(x)
    t = _conv_bn_relu(sd, "img_backbone.conv1", "img_backbone.bn1", t, stride=2, pad=3)
    t = F.max_pool2d(t, 3, stride=2, padding=1)
    outs = []
    for stage in range(4):
        stride = 1 if stage == 0 else 2
        for blk in range(STAGE_BLOCKS[101][stage]):
            src = f"img_backbone.layer{stage + 1}.{blk}"
            s = stride if blk == 0 else 1
            out = _conv_bn_relu(sd, f"{src}.conv1", f"{src}.bn1", t, stride=s)  # caffe
            if cfg.dcn_stages[stage]:
                om = F.conv2d(
                    out,
                    torch.from_numpy(sd[f"{src}.conv2.conv_offset.weight"]),
                    torch.from_numpy(sd[f"{src}.conv2.conv_offset.bias"]),
                    padding=1,
                )
                offset = om[:, :18].numpy()
                mask = torch.sigmoid(om[:, 18:]).numpy()
                out = torch.from_numpy(
                    numpy_dcn_oracle(
                        out.numpy(), offset, mask, sd[f"{src}.conv2.weight"],
                        None, 1, 1, 1, 1, 1,
                    ).astype(np.float32)
                )
                out = F.relu(_bn(sd, f"{src}.bn2", out))
            else:
                out = _conv_bn_relu(sd, f"{src}.conv2", f"{src}.bn2", out, pad=1)
            out = _bn(sd, f"{src}.bn3", F.conv2d(out, _w(sd, f"{src}.conv3")))
            if f"{src}.downsample.0.weight" in sd:
                idn = _bn(sd, f"{src}.downsample.1",
                          F.conv2d(t, _w(sd, f"{src}.downsample.0"), stride=s))
            else:
                idn = t
            t = F.relu(out + idn)
        outs.append(t)

    model = ResNet(depth=101, out_indices=(1, 2, 3), dcn_stages=cfg.dcn_stages, style="caffe")
    feats = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    for i, fi in zip((1, 2, 3), feats):
        ours = np.asarray(fi)[0].transpose(2, 0, 1)
        r = outs[i].numpy()[0]
        rel = _rel(ours, r)
        assert rel < 2e-4, (i, rel)


@pytest.mark.slow
def test_full_model_bevdet_parity(rng):
    """BEVDet end to end: image backbone + FPN + depth net + softmax-depth
    bev_pool + (already-oracled) BEV trunk, all through
    import_bevdet_checkpoint.  Match: det2trt/models/detector/bevdet.py:9-95
    forward_trt chain.  The pooling oracle is a direct numpy segment sum
    over the precomputed ranks (bev_pool_v2 semantics, bevPoolKernel.cu:20-150)."""
    from bevformer_tensorrt_tpu.configs.bevdet import bevdet_micro
    from bevformer_tensorrt_tpu.models.detectors.bevdet import BEVDet
    from bevformer_tensorrt_tpu.models.necks.view_transformer import (
        get_lidar_coor,
        voxel_pooling_prepare,
    )
    from bevformer_tensorrt_tpu.runtime.torch_import import import_bevdet_checkpoint
    from test_torch_import import synthetic_bevdet_state_dict

    cfg = bevdet_micro()
    rng_sd = np.random.default_rng(17)
    sd = synthetic_bevdet_state_dict(cfg, rng_sd)
    for k in list(sd):
        if k.endswith("weight") and sd[k].ndim == 4:
            sd[k] = (sd[k] * 0.08).astype(np.float32)
        if k.endswith("running_mean"):
            sd[k] = rng_sd.standard_normal(sd[k].shape).astype(np.float32) * 0.1
        if k.endswith("running_var"):
            sd[k] = (1.0 + 0.3 * rng_sd.random(sd[k].shape)).astype(np.float32)
    imported = import_bevdet_checkpoint(sd, depth=cfg.backbone_depth)

    # rig + ranks
    s2e, intr = [], []
    for c in range(cfg.num_cams):
        yaw = 2 * np.pi * c / cfg.num_cams
        rot = np.array(
            [[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
        ) @ np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]])
        m = np.eye(4)
        m[:3, :3] = rot
        m[:3, 3] = rng.normal(0, 0.2, 3)
        s2e.append(m)
        K = np.eye(3)
        K[0, 0] = K[1, 1] = cfg.input_w * 0.8
        K[0, 2] = cfg.input_w / 2
        K[1, 2] = cfg.input_h / 2
        intr.append(K)
    s2e = np.stack(s2e).astype(np.float32)
    intr = np.stack(intr).astype(np.float32)
    coor = get_lidar_coor(cfg, s2e, intr)
    ranks = voxel_pooling_prepare(cfg, coor, pad_to=20000)

    image = rng.standard_normal((1, cfg.num_cams, 3, cfg.input_h, cfg.input_w)).astype(np.float32)

    # ---- torch oracle: image trunk ----
    from bevformer_torch_oracle import _bn, _w, _b

    with torch.no_grad():
        timg = torch.from_numpy(image.reshape(cfg.num_cams, 3, cfg.input_h, cfg.input_w))
        feats = torch_resnet(sd, "img_backbone", timg, depth=cfg.backbone_depth)
        # BEVDet neck (FPN over the selected stages; bevdet r50 uses C4+C5
        # laterals + one output conv — mirror models/necks/fpn_bevdet usage
        # via the same key names the importer consumes)
        lats = []
        sel = [feats[2], feats[3]]
        for i, f in enumerate(sel):
            lats.append(
                F.conv2d(f, _w(sd, f"img_neck.lateral_convs.{i}.conv"),
                         _b(sd, f"img_neck.lateral_convs.{i}.conv"))
            )
        up = F.interpolate(lats[1], scale_factor=2, mode="nearest")
        merged = lats[0] + up[:, :, : lats[0].shape[2], : lats[0].shape[3]]
        fpn = F.conv2d(merged, _w(sd, "img_neck.fpn_convs.0.conv"),
                       _b(sd, "img_neck.fpn_convs.0.conv"), padding=1)
        dn = F.conv2d(fpn, _w(sd, "img_view_transformer.depth_net"),
                      _b(sd, "img_view_transformer.depth_net"))
        D = cfg.depth_bins
        depth = torch.softmax(dn[:, :D], dim=1).numpy()       # [cams, D, h, w]
        tran = dn[:, D:].numpy()                               # [cams, C', h, w]

    # numpy bev_pool_v2 over ranks (segment sum); reference bevdet grids use
    # a single z bin (grid_zbound (-5, 3, 8) -> gz = 1)
    gz = int(round((cfg.grid_zbound[1] - cfg.grid_zbound[0]) / cfg.grid_zbound[2]))
    assert gz == 1
    Cv = cfg.view_channels
    depth_flat = depth.reshape(-1)
    feat_flat = tran.transpose(0, 2, 3, 1).reshape(-1, Cv)
    bev = np.zeros((cfg.bev_h * cfg.bev_w, Cv), np.float32)
    rd = np.asarray(ranks.ranks_depth)
    rf = np.asarray(ranks.ranks_feat)
    rb = np.asarray(ranks.ranks_bev)
    valid = rb >= 0
    np.add.at(bev, rb[valid], depth_flat[rd[valid], None] * feat_flat[rf[valid]])
    bev = bev.reshape(cfg.bev_h, cfg.bev_w, Cv)

    # trunk oracle (same math as test_bevdet_bev_trunk_parity)
    with torch.no_grad():
        cur = torch.from_numpy(bev.transpose(2, 0, 1)[None])
        feats_t = []
        for s in range(3):
            for blk in range(2):
                src = f"img_bev_encoder_backbone.layers.{s}.{blk}"
                stride = 2 if blk == 0 else 1
                out = F.conv2d(cur, _w(sd, f"{src}.conv1"), stride=stride, padding=1)
                out = F.relu(_bn(sd, f"{src}.bn1", out))
                out = F.conv2d(out, _w(sd, f"{src}.conv2"), padding=1)
                out = _bn(sd, f"{src}.bn2", out)
                if blk == 0:
                    idn = F.conv2d(cur, _w(sd, f"{src}.downsample"),
                                   _b(sd, f"{src}.downsample"), stride=stride, padding=1)
                else:
                    idn = cur
                cur = F.relu(out + idn)
            feats_t.append(cur)
        up = F.interpolate(feats_t[2], scale_factor=4, mode="bilinear", align_corners=True)
        z = torch.cat([feats_t[0], up], 1)
        z = F.relu(_bn(sd, "img_bev_encoder_neck.conv.1",
                       F.conv2d(z, _w(sd, "img_bev_encoder_neck.conv.0"), padding=1)))
        z = F.relu(_bn(sd, "img_bev_encoder_neck.conv.4",
                       F.conv2d(z, _w(sd, "img_bev_encoder_neck.conv.3"), padding=1)))
        z = F.interpolate(z, scale_factor=2, mode="bilinear", align_corners=True)
        z = F.relu(_bn(sd, "img_bev_encoder_neck.up2.2",
                       F.conv2d(z, _w(sd, "img_bev_encoder_neck.up2.1"), padding=1)))
        z = F.conv2d(z, _w(sd, "img_bev_encoder_neck.up2.4"),
                     _b(sd, "img_bev_encoder_neck.up2.4"))
        y = F.relu(_bn(sd, "pts_bbox_head.shared_conv.bn",
                       F.conv2d(z, _w(sd, "pts_bbox_head.shared_conv.conv"), padding=1)))
        torch_heads = {}
        for h in ("reg", "height", "dim", "rot", "vel", "heatmap"):
            src = f"pts_bbox_head.task_heads.0.{h}"
            th = F.relu(_bn(sd, f"{src}.0.bn", F.conv2d(y, _w(sd, f"{src}.0.conv"), padding=1)))
            torch_heads[h] = F.conv2d(th, _w(sd, f"{src}.1"), _b(sd, f"{src}.1"), padding=1)

    # ---- flax side ----
    model = BEVDet(cfg)
    rd_j = jnp.asarray(rd)
    rf_j = jnp.asarray(rf)
    rb_j = jnp.asarray(rb)
    heads_j = model.apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]},
        jnp.asarray(image), rd_j, rf_j, rb_j, None, None,
    )
    for h, tv in torch_heads.items():
        ours = np.asarray(heads_j[h])[0].transpose(2, 0, 1)
        r = tv.numpy()[0]
        rel = _rel(ours, r)
        assert rel < 5e-4, (h, rel)


@pytest.mark.slow
def test_full_model_yolox_parity(rng):
    """YOLOX whole-detector parity incl. the post-process chain: reference
    forward_trt's 9 raw outputs (det2trt/models/detector/yolox.py:41-80)
    PLUS the host-side decode + class-aware NMS the reference runs in
    post_process (:57-80, mmdet YOLOXHead.get_bboxes semantics) — the raw
    maps are diffed e2e, the decode against an independent numpy oracle,
    and the final detections against an independent suppression rule."""
    from test_import_2d import synthetic_yolox_state_dict, torch_yolox_oracle

    from bevformer_tensorrt_tpu.configs.yolox import yolox_micro
    from bevformer_tensorrt_tpu.models.detectors.yolox import YOLOX
    from bevformer_tensorrt_tpu.models.heads.yolox_head import (
        yolox_decode,
        yolox_post_process,
    )
    from bevformer_tensorrt_tpu.runtime.torch_import import import_yolox_checkpoint

    cfg = yolox_micro()
    sd = synthetic_yolox_state_dict(cfg, np.random.default_rng(23))
    imported = import_yolox_checkpoint(sd)
    x = rng.standard_normal((1, 3, cfg.img_size, cfg.img_size)).astype(np.float32)
    outs = YOLOX(cfg).apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]},
        jnp.asarray(x),
    )
    with torch.no_grad():
        ref = torch_yolox_oracle(sd, torch.from_numpy(x))

    # forward_trt contract: 3 levels x {cls, reg, obj} raw maps
    for lvl in range(3):
        for k in ("cls", "reg", "obj"):
            ours = np.asarray(outs[lvl][k])[0].transpose(2, 0, 1)
            r = ref[lvl][k].numpy()[0]
            assert _rel(ours, r) < 1e-4, (lvl, k, _rel(ours, r))

    # decode parity vs an independent numpy grid/exp decode
    boxes, scores = yolox_decode(outs)
    ob, os_ = [], []
    for lvl, s in enumerate((8, 16, 32)):
        cls = ref[lvl]["cls"].numpy()[0]  # [C, h, w]
        reg = ref[lvl]["reg"].numpy()[0]
        obj = ref[lvl]["obj"].numpy()[0]
        C, h, w = cls.shape
        gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
        cx = (reg[0] + gx) * s
        cy = (reg[1] + gy) * s
        bw = np.exp(reg[2]) * s
        bh = np.exp(reg[3]) * s
        b = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
        sc = 1 / (1 + np.exp(-cls)) * (1 / (1 + np.exp(-obj)))
        ob.append(b.reshape(-1, 4))
        os_.append(sc.transpose(1, 2, 0).reshape(-1, C))
    ob = np.concatenate(ob)
    os_ = np.concatenate(os_)
    assert _rel(np.asarray(boxes)[0], ob) < 1e-4
    assert _rel(np.asarray(scores)[0], os_) < 1e-4

    # post-process parity: our multiclass NMS vs an independent pairwise
    # suppression oracle ("keep iff no higher-scoring kept same-class box
    # overlaps above the threshold" evaluated by brute force)
    thr, iou_thr = 0.3, 0.65
    db, ds, dl = yolox_post_process(
        np.asarray(boxes)[0], np.asarray(scores)[0],
        score_thr=thr, iou_threshold=iou_thr, max_per_img=1000,
    )

    def iou_mat(a, b):
        x1 = np.maximum(a[:, None, 0], b[None, :, 0])
        y1 = np.maximum(a[:, None, 1], b[None, :, 1])
        x2 = np.minimum(a[:, None, 2], b[None, :, 2])
        y2 = np.minimum(a[:, None, 3], b[None, :, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        ar = lambda z: np.maximum(z[:, 2] - z[:, 0], 0) * np.maximum(z[:, 3] - z[:, 1], 0)
        return inter / np.maximum(ar(a)[:, None] + ar(b)[None] - inter, 1e-12)

    want = []
    for c in range(os_.shape[1]):
        m = os_[:, c] > thr
        if not m.any():
            continue
        b, s = ob[m], os_[m][:, c]
        order = np.argsort(-s)
        b, s = b[order], s[order]
        kept = []
        for i in range(len(b)):
            if all(iou_mat(b[i : i + 1], b[j : j + 1])[0, 0] <= iou_thr for j in kept):
                kept.append(i)
        want += [(c, float(s[i])) for i in kept]
    got = sorted((int(l), float(s)) for l, s in zip(dl, ds))
    want = sorted(want)
    # scores diverge at float32 rounding (ours is a float32 jax pipeline,
    # the oracle float64 numpy) — match classes exactly, scores to 1e-4 rel
    assert [g[0] for g in got] == [w_[0] for w_ in want]
    np.testing.assert_allclose(
        [g[1] for g in got], [w_[1] for w_ in want], rtol=1e-4
    )


@pytest.mark.slow
def test_full_model_centernet_parity(rng):
    """CenterNet whole-detector parity: image -> R18 (BasicBlock) ->
    CTResNetNeck (DCNv2 + deconv) -> head maps, e2e through
    import_centernet_checkpoint vs a torch+numpy-DCN oracle, plus the
    decode_heatmap top-k chain vs an independent numpy local-max oracle.
    Match: det2trt/models/detector/centernet.py:7-34 forward_trt (raw
    heatmap/wh/offset maps) + post_process (mmdet decode_heatmap)."""
    from test_import_2d import synthetic_centernet_state_dict, _bn_t
    from test_ops_misc import numpy_dcn_oracle

    from bevformer_tensorrt_tpu.configs.centernet import centernet_r18
    from bevformer_tensorrt_tpu.models.backbones.resnet import STAGE_BLOCKS
    from bevformer_tensorrt_tpu.models.detectors.centernet import CenterNet
    from bevformer_tensorrt_tpu.models.heads.centernet_head import centernet_decode
    from bevformer_tensorrt_tpu.runtime.torch_import import import_centernet_checkpoint

    cfg = centernet_r18(img_size=64, deconv_filters=(16, 8, 8), topk=8)
    filters = tuple(cfg.deconv_filters)
    sd = synthetic_centernet_state_dict(cfg, np.random.default_rng(29), filters)
    # scale down conv weights: 8 conv layers of std 0.15 at these widths
    # amplify activations enough to make bilinear DCN sampling chaotic
    for k in sd:
        if k.endswith("weight") and sd[k].ndim == 4 and "conv_offset" not in k:
            sd[k] = (sd[k] * 0.6).astype(np.float32)
    imported = import_centernet_checkpoint(sd, depth=cfg.backbone_depth)

    x = rng.standard_normal((1, 3, cfg.img_size, cfg.img_size)).astype(np.float32)

    # ---- torch oracle: R18 BasicBlock trunk (mmcv ResNet, pytorch style:
    # stride on the first 3x3; downsample = 1x1-stride-2 conv+bn) ----
    with torch.no_grad():
        t = F.conv2d(torch.from_numpy(x), torch.from_numpy(sd["backbone.conv1.weight"]),
                     stride=2, padding=3)
        t = F.relu(_bn_t(t, sd, "backbone.bn1"))
        t = F.max_pool2d(t, 3, stride=2, padding=1)
        for stage in range(4):
            for blk in range(STAGE_BLOCKS[18][stage]):
                src = f"backbone.layer{stage + 1}.{blk}"
                s = (2 if stage > 0 else 1) if blk == 0 else 1
                out = F.conv2d(t, torch.from_numpy(sd[f"{src}.conv1.weight"]),
                               stride=s, padding=1)
                out = F.relu(_bn_t(out, sd, f"{src}.bn1"))
                out = F.conv2d(out, torch.from_numpy(sd[f"{src}.conv2.weight"]), padding=1)
                out = _bn_t(out, sd, f"{src}.bn2")
                if f"{src}.downsample.0.weight" in sd:
                    idn = _bn_t(
                        F.conv2d(t, torch.from_numpy(sd[f"{src}.downsample.0.weight"]), stride=s),
                        sd, f"{src}.downsample.1",
                    )
                else:
                    idn = t
                t = F.relu(out + idn)
        # CTResNetNeck: [DCNv2 ConvModule, deconv ConvModule] x3
        cur = t
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
            th = F.relu(F.conv2d(cur, torch.from_numpy(sd[f"bbox_head.{name}_head.0.weight"]),
                                 torch.from_numpy(sd[f"bbox_head.{name}_head.0.bias"]), padding=1))
            torch_heads[name] = F.conv2d(
                th, torch.from_numpy(sd[f"bbox_head.{name}_head.2.weight"]),
                torch.from_numpy(sd[f"bbox_head.{name}_head.2.bias"]),
            )

    # ---- flax e2e ----
    heads_j = CenterNet(cfg).apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]},
        jnp.asarray(x),
    )
    for name, tv in torch_heads.items():
        ours = np.asarray(heads_j[name])[0].transpose(2, 0, 1)
        r = tv.numpy()[0]
        assert _rel(ours, r) < 5e-4, (name, _rel(ours, r))

    # ---- decode chain vs independent numpy local-max + top-k oracle ----
    boxes, scores, labels = centernet_decode(heads_j, k=cfg.topk, stride=4)
    heat = 1 / (1 + np.exp(-torch_heads["heatmap"].numpy()[0]))  # [C, H, W]
    C, H, W = heat.shape
    hmax = F.max_pool2d(torch.from_numpy(heat)[None], 3, stride=1, padding=1).numpy()[0]
    peaks = np.where(hmax == heat, heat, 0.0).reshape(-1)
    top = np.argsort(-peaks)[: cfg.topk]
    exp_scores = peaks[top]
    exp_labels = top // (H * W)
    spatial = top % (H * W)
    ys, xs = (spatial // W).astype(np.float32), (spatial % W).astype(np.float32)
    wh = torch_heads["wh"].numpy()[0].reshape(2, -1)
    off = torch_heads["offset"].numpy()[0].reshape(2, -1)
    cx = (xs + off[0, spatial]) * 4
    cy = (ys + off[1, spatial]) * 4
    bw, bh = wh[0, spatial] * 4, wh[1, spatial] * 4
    exp_boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
    # top-k order may differ on near-ties: compare as score-sorted sets
    got = sorted(zip(np.asarray(scores)[0].tolist(), np.asarray(labels)[0].tolist()))
    want = sorted(zip(exp_scores.tolist(), exp_labels.tolist()))
    np.testing.assert_allclose([g[0] for g in got], [w_[0] for w_ in want], rtol=1e-4)
    assert [g[1] for g in got] == [w_[1] for w_ in want]
    order_g = np.argsort(-np.asarray(scores)[0], kind="stable")
    order_w = np.argsort(-exp_scores, kind="stable")
    np.testing.assert_allclose(
        np.asarray(boxes)[0][order_g], exp_boxes[order_w], rtol=2e-3, atol=1e-3
    )
