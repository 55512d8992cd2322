"""Per-op benchmark table — the analogue of the reference's per-plugin
speedup table (TensorRT/README.md:7-253, RTX 2080Ti per-plugin rows).

Chained-call methodology (CLAUDE.md measurement rules): each op runs as a
k-chain inside ONE jit where iteration i+1's input depends on iteration i's
output (CSE-proof), timed by host readback; per-op cost = slope between the
k and 2k chains, which cancels the ~28 ms dispatch floor.

Usage:
  python tools/opbench.py [--k 8] [--out OPBENCH_r3.md]

Writes a markdown table: op family x precision tier, ms/op and speedup vs
the family's fp32/bf16 row.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="OPBENCH_r3.md")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bevformer_tensorrt_tpu.ops import (
        bev_pool_v2,
        grid_sample_2d,
        modulated_deform_conv2d,
        multi_scale_deformable_attn_sorted,
        qkv,
        rotate,
    )
    from bevformer_tensorrt_tpu.ops.pallas.flash_attn import (
        flash_attention,
        flash_attention_int8,
    )

    rng = np.random.default_rng(0)

    def chain_time(make_step, x0, k):
        """ms per op via the slope between k- and 2k-chains.

        Each timing call feeds the previous call's OUTPUT back as input so
        no two dispatches are identical — the relay result-caches repeated
        identical calls (CLAUDE.md measurement rules), which would zero the
        slope for cheap ops."""

        def chained(n):
            @jax.jit
            def f(x):
                for _ in range(n):
                    x = make_step(x)
                return x

            x = f(x0)  # warm (compile)
            np.asarray(jax.tree.leaves(x)[0].ravel()[0])
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                x = f(x)
                np.asarray(jax.tree.leaves(x)[0].ravel()[0])
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1, t2 = chained(k), chained(2 * k)
        return (t2 - t1) * 1000.0 / k

    rows = []

    def add(family, tier, ms, base_ms=None):
        sp = "" if base_ms is None else f"{base_ms / ms:.2f}x"
        rows.append((family, tier, ms, sp))
        print(f"{family:24s} {tier:8s} {ms:8.3f} ms  {sp}", file=sys.stderr, flush=True)

    # ---- grid_sample 2D (N1): backbone-scale feature, BEV-query grid ------
    N, C, H, W = 6, 256, 58, 100
    gq = 14080
    inp = jnp.asarray(rng.standard_normal((N, C, H, W)), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1, 1, (N, gq // N if gq % N == 0 else 2048, 1, 2)), jnp.float32)

    base = None
    for tier, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        x0 = inp.astype(dt)

        def step(x):
            y = grid_sample_2d(x, grid)  # [N, C, hq, 1]
            return x + y.mean() * jnp.asarray(1e-6, x.dtype)

        ms = chain_time(step, x0, 4 * args.k)
        if base is None:
            base = ms
        add("grid_sample_2d", tier, ms, base if tier != "fp32" else None)

    # ---- MSDA sorted (N2): base cross-attention shape ----------------------
    cams, keys, heads, ch = 6, 30825, 8, 32
    nq = 14080
    shapes = ((116, 200), (58, 100), (29, 50), (15, 25))
    L, P, ppg = 4, 8, 4
    value = jnp.asarray(rng.standard_normal((cams, keys, heads, ch)), jnp.bfloat16)
    # realistic pillar geometry: the ppg z-anchors of one query are the
    # projections of ONE pillar — same x, monotonically spread y (the real
    # rig's vertical parallax) — and queries are sigma-sorted by the middle
    # anchor's raster position (what the encoder's compaction provides)
    base_x = rng.uniform(0.02, 0.98, (cams, nq, 1)).astype(np.float32)
    base_y = rng.uniform(0.1, 0.9, (cams, nq, 1)).astype(np.float32)
    zoff = np.linspace(-0.08, 0.08, ppg, dtype=np.float32).reshape(1, 1, ppg)
    ref_np = np.stack(
        [np.broadcast_to(base_x, (cams, nq, ppg)),
         np.clip(base_y + zoff, 0.02, 0.98)], axis=-1
    ).reshape(cams, nq, ppg * 2).astype(np.float32)
    order = np.argsort(
        np.floor(ref_np[..., 2 * (ppg // 2) + 1] * 116) * 200
        + np.floor(ref_np[..., 2 * (ppg // 2)] * 200), axis=1
    )
    ref = jnp.asarray(np.take_along_axis(ref_np, order[..., None], axis=1))
    off = jnp.asarray(rng.standard_normal((cams, nq, heads, L * P * 2)) * 2, jnp.float32)
    attn = jnp.asarray(rng.standard_normal((cams, nq, heads, L * P)), jnp.float32)

    base = None
    for tier, packed in (("bf16", True), ("int8", "int8")):
        def step(x, packed=packed):
            y = multi_scale_deformable_attn_sorted(
                x, ref, off, attn, shapes, packed=packed
            )
            return x + y.mean().astype(x.dtype) * jnp.asarray(1e-6, x.dtype)

        ms = chain_time(step, value, max(2, args.k // 2))
        if base is None:
            base = ms
        add("msda_sorted (cross)", tier, ms, base if tier != "bf16" else None)

    # ---- DCNv2 (N3): backbone c4 block shape -------------------------------
    N, Cin, H, W = 6, 256, 58, 100
    Cout = 256
    x_nhwc = jnp.asarray(rng.standard_normal((N, H, W, Cin)), jnp.bfloat16)
    offm = jnp.asarray(rng.standard_normal((N, H, W, 18)) * 2, jnp.float32)
    maskm = jnp.asarray(rng.uniform(0, 1, (N, H, W, 9)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((Cout, Cin, 3, 3)) * 0.05, jnp.float32)

    base = None
    for tier, q in (("bf16", False), ("int8", "int8")):
        def step(x, q=q):
            y = modulated_deform_conv2d(
                x, offm, maskm, wgt, None, quant=q, layout="NHWC"
            )
            return x + y.mean().astype(x.dtype) * jnp.asarray(1e-6, x.dtype)

        ms = chain_time(step, x_nhwc, max(2, args.k // 2))
        if base is None:
            base = ms
        add("dcn_v2 (c4)", tier, ms, base if tier != "bf16" else None)

    # ---- rotate (N4): prev-BEV rotation at base scale ----------------------
    C, H, W = 256, 200, 200
    img = jnp.asarray(rng.standard_normal((C, H, W)), jnp.float32)
    center = jnp.asarray([100.0, 100.0], jnp.float32)

    base = None
    for tier, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        x0 = img.astype(dt)

        def step(x):
            y = rotate(x, x[0, 0, 0] * jnp.asarray(1e-3, x.dtype) + 3.0, center,
                       interpolation="nearest")
            return y

        ms = chain_time(step, x0, 8 * args.k)
        if base is None:
            base = ms
        add("rotate (200x200)", tier, ms, base if tier != "fp32" else None)

    # ---- bev_pool_v2 (N6): bevdet r50 shape --------------------------------
    from bevformer_tensorrt_tpu.configs.bevdet import bevdet_r50

    cfg = bevdet_r50()
    D, fh, fw, Cv = cfg.depth_bins, cfg.feat_h, cfg.feat_w, cfg.view_channels
    npts = 6 * D * fh * fw
    n_in = 400000
    rd = jnp.asarray(rng.integers(0, npts, n_in), jnp.int32)
    rf = jnp.asarray(rng.integers(0, 6 * fh * fw, n_in), jnp.int32)
    rb = jnp.asarray(np.sort(rng.integers(0, cfg.bev_h * cfg.bev_w, n_in)), jnp.int32)
    depth = jnp.asarray(rng.uniform(0, 1, (6, D, fh, fw)), jnp.float32)
    feat = jnp.asarray(rng.standard_normal((6, fh, fw, Cv)), jnp.float32)

    def step(x):
        y = bev_pool_v2(x, feat, rd, rf, rb, None, None,
                        out_height=cfg.bev_h, out_width=cfg.bev_w)
        return x + y.mean() * jnp.asarray(1e-6, x.dtype)

    add("bev_pool_v2 (r50)", "fp32", chain_time(step, depth, args.k))

    # ---- flash MHA (N7): decoder self-attention shape ----------------------
    B, qlen, d = 8, 960, 32
    q = jnp.asarray(rng.standard_normal((B, qlen, d)), jnp.bfloat16)

    base = None
    for tier, impl in (("bf16", flash_attention), ("int8", flash_attention_int8)):
        def step(x, impl=impl):
            y = impl(x, x, x)
            return x + y.mean().astype(x.dtype) * jnp.asarray(1e-6, x.dtype)

        ms = chain_time(step, q, 16 * args.k)
        if base is None:
            base = ms
        add("flash_mha (decoder)", tier, ms, base if tier != "bf16" else None)

    # ---- fused qkv (XLA fallback MHA) --------------------------------------
    def step(x):
        y = qkv(x, x, x)
        return x + y.mean().astype(x.dtype) * jnp.asarray(1e-6, x.dtype)

    add("qkv (xla)", "bf16", chain_time(step, q, 16 * args.k))

    # ---- markdown -----------------------------------------------------------
    dev = __import__("jax").devices()[0]
    lines = [
        "# Per-op benchmark (chained-call slope, one v5e chip)",
        "",
        f"Device: {dev.platform} {getattr(dev, 'device_kind', '?')}.  "
        f"Methodology: k-chained calls in one jit, per-op ms = slope between "
        f"k and 2k chains (cancels the ~28 ms relay dispatch floor).  "
        f"Mirrors the reference's per-plugin table "
        f"(TensorRT/README.md:7-253); shapes are the base-tier deploy shapes.",
        "",
        "| op family | tier | ms/op | speedup vs first tier |",
        "|---|---|---|---|",
    ]
    for fam, tier, ms, sp in rows:
        lines.append(f"| {fam} | {tier} | {ms:.3f} | {sp} |")
    Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
