"""Per-component latency bisection on the current backend.

Times backbone (with/without DCN), FPN, encoder (plus isolated temporal
self-attention and spatial cross-attention layers), and decoder, using a
realistic nuScenes-like camera rig so compaction/sorting behave as in
deployment.  Prints one human line per stage and a final JSON summary —
the structured replacement for round-1's hand-made NOTES breakdown
(VERDICT r1 #9).  Usage: python tools/component_bench.py [base|tiny]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(fn, *args, iters=3, warmup=1):
    import jax

    for _ in range(warmup):
        r = fn(*args)
        jax.tree.leaves(r)[0].block_until_ready()
        np.asarray(jax.tree.leaves(r)[0].ravel()[0])  # force readback sync
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="base")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from bevformer_tensorrt_tpu.configs import bevformer as cfgs
    from bevformer_tensorrt_tpu.models.backbones.resnet import ResNet
    from bevformer_tensorrt_tpu.models.necks.fpn import FPN

    cfg = getattr(cfgs, f"bevformer_{args.model}")(dtype=args.dtype)
    dtype = jnp.dtype(cfg.dtype)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    img = jnp.asarray(
        rng.standard_normal((cfg.num_cams, cfg.img_h, cfg.img_w, 3)), dtype
    )

    # 1. backbone without DCN
    bb_plain = ResNet(depth=cfg.backbone_depth, out_indices=cfg.backbone_out_indices,
                      dcn_stages=(False,) * 4, style="caffe")
    v = jax.jit(bb_plain.init)(key, img)
    t = timeit(jax.jit(lambda v, x: bb_plain.apply(v, x)), v, img)
    print(f"backbone (no DCN): {t:.1f} ms", flush=True)

    # 2. backbone with DCN (as configured)
    if any(cfg.dcn_stages):
        bb_dcn = ResNet(depth=cfg.backbone_depth, out_indices=cfg.backbone_out_indices,
                        dcn_stages=cfg.dcn_stages, style="caffe")
        v2 = jax.jit(bb_dcn.init)(key, img)
        t_bb = timeit(jax.jit(lambda v, x: bb_dcn.apply(v, x)), v2, img)
        print(f"backbone (DCN): {t_bb:.1f} ms", flush=True)
        feats = jax.jit(lambda v, x: bb_dcn.apply(v, x))(v2, img)
    else:
        t_bb = t
        feats = jax.jit(lambda v, x: bb_plain.apply(v, x))(v, img)

    # 3. FPN
    fpn = FPN(out_channels=cfg.embed_dims, num_outs=cfg.num_levels)
    vf = jax.jit(fpn.init)(key, feats)
    t_fpn = timeit(jax.jit(lambda v, x: fpn.apply(v, x)), vf, feats)
    print(f"fpn: {t_fpn:.1f} ms", flush=True)
    mlvl = jax.jit(lambda v, x: fpn.apply(v, x))(vf, feats)
    mlvl = [f.reshape(1, cfg.num_cams, *f.shape[1:]) for f in mlvl]

    # 4. encoder (head-level: transformer encoder only)
    from bevformer_tensorrt_tpu.models.modules.encoder import BEVFormerEncoder

    nq = cfg.bev_h * cfg.bev_w
    enc = BEVFormerEncoder(cfg)
    value = jnp.asarray(
        rng.standard_normal(
            (cfg.num_cams, sum(f.shape[2] * f.shape[3] for f in mlvl), cfg.embed_dims)
        ),
        dtype,
    )
    bev_q = jnp.asarray(rng.standard_normal((1, nq, cfg.embed_dims)), dtype)
    bev_pos = jnp.zeros((1, nq, cfg.embed_dims), dtype)
    from tools.geometry_analysis import nuscenes_like_rig

    rig = nuscenes_like_rig(cfg.img_w, cfg.img_h)[: cfg.num_cams]
    l2i = jnp.asarray(rig.reshape(1, cfg.num_cams, 4, 4).astype(np.float32))
    prev = jnp.zeros((1, nq, cfg.embed_dims), dtype)
    shift = jnp.zeros(2, jnp.float32)
    shapes = tuple((f.shape[2], f.shape[3]) for f in mlvl)
    ve = jax.jit(lambda k, *a: enc.init(k, *a, shapes))(
        key, bev_q, value, bev_pos, l2i, prev, shift, jnp.float32(1.0)
    )
    enc_apply = jax.jit(
        lambda v, *a: enc.apply(v, *a, shapes)
    )
    t_enc = timeit(enc_apply, ve, bev_q, value, bev_pos, l2i, prev, shift, jnp.float32(1.0))
    print(f"encoder ({cfg.encoder_layers} layers): {t_enc:.1f} ms", flush=True)

    # 4b. isolated attention stages (one layer each)
    from bevformer_tensorrt_tpu.models.modules.attention import (
        SpatialCrossAttention,
        TemporalSelfAttention,
    )
    from bevformer_tensorrt_tpu.models.modules.encoder import (
        get_reference_points_3d,
        point_sampling,
    )

    tsa = TemporalSelfAttention(
        embed_dims=cfg.embed_dims, num_heads=cfg.num_heads,
        num_points=cfg.num_points_self, msda_impl=cfg.msda_impl,
    )
    prev_q = jnp.concatenate([prev, bev_q], axis=0)
    ref2d = jnp.asarray(
        np.tile(
            get_reference_points_3d(cfg.bev_h, cfg.bev_w, 1)[0, 0, :, :2].reshape(
                1, nq, 1, 2
            ),
            (2, 1, 1, 1),
        )
    )
    vt_ = jax.jit(
        lambda k, *a: tsa.init(k, *a, ((cfg.bev_h, cfg.bev_w),))
    )(key, bev_q, prev_q, bev_q, bev_pos, ref2d)
    tsa_apply = jax.jit(
        lambda v, *a: tsa.apply(v, *a, ((cfg.bev_h, cfg.bev_w),))
    )
    t_tsa = timeit(tsa_apply, vt_, bev_q, prev_q, bev_q, bev_pos, ref2d)
    print(f"encoder self-attn (1 layer): {t_tsa:.1f} ms", flush=True)

    ref3d = jnp.asarray(
        get_reference_points_3d(cfg.bev_h, cfg.bev_w, cfg.num_points_in_pillar)
    )
    ref_cam, bev_mask = point_sampling(
        ref3d, cfg.pc_range, l2i, (cfg.img_h, cfg.img_w), cfg.num_cams
    )
    sca = SpatialCrossAttention(
        embed_dims=cfg.embed_dims, num_cams=cfg.num_cams, num_heads=cfg.num_heads,
        num_levels=cfg.num_levels, num_points=cfg.num_points_cross,
        cam_budget=cfg.cam_budget, msda_impl=cfg.msda_impl,
    )
    vs_ = jax.jit(
        lambda k, *a: sca.init(k, *a, shapes)
    )(key, bev_q, value.reshape(cfg.num_cams, -1, cfg.embed_dims), bev_q, None,
      ref_cam, bev_mask)
    sca_apply = jax.jit(lambda v, *a: sca.apply(v, *a, shapes))
    t_sca = timeit(
        sca_apply, vs_, bev_q, value.reshape(cfg.num_cams, -1, cfg.embed_dims),
        bev_q, None, ref_cam, bev_mask
    )
    print(f"encoder cross-attn (1 layer): {t_sca:.1f} ms", flush=True)

    # 5. decoder
    from bevformer_tensorrt_tpu.models.modules.decoder import DetectionTransformerDecoder

    dec = DetectionTransformerDecoder(cfg)
    q = jnp.asarray(rng.standard_normal((1, cfg.num_query, cfg.embed_dims)), dtype)
    qp = jnp.asarray(rng.standard_normal((1, cfg.num_query, cfg.embed_dims)), dtype)
    bev = jnp.asarray(rng.standard_normal((1, nq, cfg.embed_dims)), dtype)
    refp = jnp.asarray(rng.uniform(0.2, 0.8, (1, cfg.num_query, 3)), jnp.float32)
    reg = lambda lid, x: jnp.zeros((1, cfg.num_query, cfg.code_size), jnp.float32)
    vd = dec.init(key, q, qp, bev, refp, reg)
    dec_apply = jax.jit(lambda v, *a: dec.apply(v, *a, reg))
    t_dec = timeit(dec_apply, vd, q, qp, bev, refp)
    print(f"decoder ({cfg.decoder_layers} layers): {t_dec:.1f} ms", flush=True)

    import json

    K = min(nq, -(-int(nq * cfg.cam_budget) // 128) * 128)
    taps_cross = cfg.num_cams * K * cfg.num_heads * cfg.num_levels * cfg.num_points_cross
    taps_self = 2 * nq * cfg.num_heads * cfg.num_points_self
    print(json.dumps({
        "model": args.model,
        "dtype": args.dtype,
        "msda_impl": cfg.msda_impl,
        "backbone_ms": round(t_bb, 2),
        "fpn_ms": round(t_fpn, 2),
        "encoder_ms": round(t_enc, 2),
        "encoder_self_1l_ms": round(t_tsa, 2),
        "encoder_cross_1l_ms": round(t_sca, 2),
        "decoder_ms": round(t_dec, 2),
        "cross_gather_mtaps_per_s": round(taps_cross / (t_sca / 1e3) / 1e6, 1),
        "self_gather_mtaps_per_s": round(taps_self / (t_tsa / 1e3) / 1e6, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
