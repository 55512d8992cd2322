"""bev_pool_v2 implementation A/B on the real chip (VERDICT r3 item 4 —
BEVDet is bev_pool-bound: the 400k-point scatter+gathers are ~7 of the
10.6 ms device frame, trace_bevdet 2026-08-19).

Chained-slope timing (CLAUDE.md methodology) of:
  scatter           — P-row scatter-add (r3 production)
  scatter_sorted    — same with indices_are_sorted hint (ranks ARE sorted)
  interval          — cumsum + boundary-difference + unique-cell scatter
  x pad {tight, 400k} x contrib dtype {f32, bf16}

Usage: python tools/bevpool_ab.py [--iters 4]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from bevformer_tensorrt_tpu.configs.bevdet import bevdet_r50
    from bevformer_tensorrt_tpu.models.necks.view_transformer import (
        get_lidar_coor,
        voxel_pooling_prepare,
    )
    from bevformer_tensorrt_tpu.ops.bev_pool import bev_pool_v2

    cfg = bevdet_r50()
    N = cfg.num_cams
    s2e = np.broadcast_to(np.eye(4, dtype=np.float32), (N, 4, 4)).copy()
    intr = np.stack(
        [np.array([[800.0, 0, cfg.input_w / 2], [0, 800.0, cfg.input_h / 2],
                   [0, 0, 1]], np.float32)] * N
    )
    coor = get_lidar_coor(cfg, s2e, intr)
    npts = int(np.prod(coor.shape[:-1]))
    tight = -(-npts // 8192) * 8192
    gz = int(round((cfg.grid_zbound[1] - cfg.grid_zbound[0]) / cfg.grid_zbound[2]))

    rng = np.random.default_rng(0)
    D = cfg.depth_bins
    hf, wf = cfg.input_h // 16, cfg.input_w // 16
    depth = jnp.asarray(rng.random((N, D, hf, wf)), jnp.float32)
    feat = jnp.asarray(rng.standard_normal((N, hf, wf, cfg.view_channels)), jnp.float32)

    def timeit(fn, *a):
        o = fn(*a)
        jax.block_until_ready(o)
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            o = fn(*a)
            np.asarray(jax.tree.leaves(o)[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    results = {}
    for pad_name, pad in (("tight", tight), ("400k", 400000)):
        ranks = voxel_pooling_prepare(
            cfg, coor, pad_to=pad, pad_intervals_to=cfg.bev_h * cfg.bev_w * gz
        )
        rd, rf, rb = map(jnp.asarray, (ranks.ranks_depth, ranks.ranks_feat, ranks.ranks_bev))
        iv = (jnp.asarray(ranks.interval_starts), jnp.asarray(ranks.interval_lengths))
        for impl in ("scatter", "scatter_sorted", "interval"):
            for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
                dep, fea = depth.astype(dt), feat.astype(dt)
                K = args.k

                def chain(dep, fea):
                    out = None
                    d = dep
                    for _ in range(K):
                        out = bev_pool_v2(
                            d, fea, rd, rf, rb, *iv,
                            out_height=cfg.bev_h, out_width=cfg.bev_w,
                            impl=impl,
                        )
                        d = dep * (1 + 0 * out.mean().astype(dep.dtype))
                    return out[0, 0, 0, 0]

                f1 = jax.jit(lambda dep, fea: bev_pool_v2(
                    dep, fea, rd, rf, rb, *iv,
                    out_height=cfg.bev_h, out_width=cfg.bev_w, impl=impl,
                )[0, 0, 0, 0])
                fk = jax.jit(chain)
                try:
                    t1 = timeit(f1, dep, fea)
                    tk = timeit(fk, dep, fea)
                except Exception as e:
                    results[f"{impl}/{pad_name}/{dt_name}"] = f"FAIL {type(e).__name__}"
                    continue
                slope = (tk - t1) / (K - 1)
                results[f"{impl}/{pad_name}/{dt_name}"] = round(slope * 1e3, 3)
                print(f"{impl:15s} pad={pad_name:6s} {dt_name}: "
                      f"{slope * 1e3:7.3f} ms/op", file=sys.stderr, flush=True)
    print(json.dumps({"points_tight": tight, "results": results}))


if __name__ == "__main__":
    main()
