"""Continuous-batching serving throughput benchmark.

Measures the ContinuousBatchingEngine (runtime/serving.py) on a synthetic
multi-scene frame stream and compares against the sequential batch-1 loop
— the reference's only deployment mode (tools/bevformer/evaluate_trt.py:
82-154, one frame at a time, prev_bev through the host).  Throughput is
aggregate frames/s across concurrent scenes; per-scene frame order is
preserved by the scheduler.

Usage:
  python tools/serving_bench.py --model tiny --scenes 4 --frames 8 --batch 4
  JAX_PLATFORMS=cpu python tools/serving_bench.py --model micro ...
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
    ap.add_argument("--model", default="tiny", choices=["micro", "tiny", "small", "base"])
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--frames", type=int, default=8, help="frames per scene")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--skip-sequential", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.configs import bevformer as cfgs
    from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer
    from bevformer_tensorrt_tpu.runtime.serving import (
        ContinuousBatchingEngine,
        FrameRequest,
    )

    cfg = getattr(cfgs, f"bevformer_{args.model}")(dtype=args.dtype)
    model = BEVFormer(cfg)
    nq = cfg.bev_h * cfg.bev_w

    rng = np.random.default_rng(0)
    img_shape = (1, cfg.num_cams, 3, cfg.img_h, cfg.img_w)
    image = rng.standard_normal(img_shape).astype(np.float32)
    from tools.geometry_analysis import nuscenes_like_rig

    l2i = (
        nuscenes_like_rig(cfg.img_w, cfg.img_h)[: cfg.num_cams]
        .reshape(1, cfg.num_cams, 4, 4)
        .astype(np.float32)
    )

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(image),
        jnp.zeros((nq, 1, cfg.embed_dims), jnp.float32),
        jnp.float32(0.0),
        jnp.zeros(cfg.can_bus_dims, jnp.float32),
        jnp.asarray(l2i),
    )

    def make_stream():
        reqs = []
        for s in range(args.scenes):
            for f in range(args.frames):
                cb = rng.standard_normal(cfg.can_bus_dims).astype(np.float32)
                reqs.append(
                    FrameRequest(
                        scene_id=s, image=image, can_bus=cb, lidar2img=l2i,
                        tag=(s, f),
                    )
                )
        return reqs

    total = args.scenes * args.frames

    # --- continuous batching ---
    eng = ContinuousBatchingEngine(
        model, variables, cfg, max_scenes=max(args.scenes, args.batch),
        batch=args.batch,
    )
    for r in make_stream():
        eng.submit(r)
    t0 = time.perf_counter()
    got = eng.drain()
    # force readback of the last result (tunneled-backend timing rule)
    np.asarray(got[-1][2]).ravel()[0]
    dt_warm = time.perf_counter() - t0  # includes compile
    assert len(got) == total, (len(got), total)

    for s in range(args.scenes):
        eng.finish_scene(s)
    for r in make_stream():
        eng.submit(r)
    t0 = time.perf_counter()
    got = eng.drain()
    np.asarray(got[-1][2]).ravel()[0]
    dt = time.perf_counter() - t0
    fps_cb = total / dt

    # --- sequential batch-1 loop (the reference's deployment shape) ---
    fps_seq = None
    if not args.skip_sequential:
        @jax.jit
        def one(v, img, pb, up, cb, li):
            return model.apply(v, img, pb, up, cb, li)

        pb = jnp.zeros((nq, 1, cfg.embed_dims), jnp.float32)
        bev, c1, c2 = one(
            variables, jnp.asarray(image), pb, jnp.float32(0.0),
            jnp.zeros(cfg.can_bus_dims, jnp.float32), jnp.asarray(l2i),
        )
        np.asarray(c2).ravel()[0]
        t0 = time.perf_counter()
        n_seq = 0
        for s in range(args.scenes):
            pb = jnp.zeros((nq, 1, cfg.embed_dims), jnp.float32)
            for f in range(args.frames):
                bev, c1, c2 = one(
                    variables, jnp.asarray(image), pb,
                    jnp.float32(0.0 if f == 0 else 1.0),
                    jnp.zeros(cfg.can_bus_dims, jnp.float32), jnp.asarray(l2i),
                )
                pb = bev
                np.asarray(c2).ravel()[0]
                n_seq += 1
        dt_seq = time.perf_counter() - t0
        fps_seq = n_seq / dt_seq

    rec = {
        "metric": f"serving_{args.model}_batch{args.batch}_fps",
        "value": round(fps_cb, 3),
        "unit": "frames/s",
        "scenes": args.scenes,
        "frames_per_scene": args.frames,
        "compile_s": round(dt_warm - dt, 1),
    }
    if fps_seq is not None:
        rec["sequential_fps"] = round(fps_seq, 3)
        rec["speedup_vs_sequential"] = round(fps_cb / fps_seq, 3)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
