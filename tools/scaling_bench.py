"""Scaling benchmark: train-step throughput across mesh sizes.

The reference has no multi-device inference at all (SURVEY.md §2.6); this
harness measures the new capability: the same jitted training step over
1/2/4/8-device meshes (virtual CPU devices when no multi-chip hardware —
validates sharding/collective structure; wall-clock speedups need real
chips).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/scaling_bench.py [--steps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    args = ap.parse_args()

    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    # honor an explicit platform BEFORE the backend initializes — flipping
    # jax_platforms after a devices() call leaves default_backend() on the
    # first platform, and the sorted kernel's interpret fallback keys off it
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if len(jax.devices()) < max(args.devices):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bevformer_tensorrt_tpu.configs.bevformer import bevformer_micro
    from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer
    from bevformer_tensorrt_tpu.parallel import make_mesh, param_shardings
    from bevformer_tensorrt_tpu.train import init_train_state, make_optimizer, make_train_step

    # jnp MSDA: this harness measures sharding/collective structure, not
    # kernels — the differentiable XLA path compiles on every backend
    cfg = bevformer_micro(msda_impl="jnp")
    model = BEVFormer(cfg)
    tx = make_optimizer()
    results = {}
    for n in args.devices:
        devs = jax.devices()[:n] if len(jax.devices()) >= n else jax.devices("cpu")[:n]
        if len(devs) < n:
            print(f"skip n={n}: not enough devices", file=sys.stderr)
            continue
        mesh = make_mesh(devs)
        dp = mesh.shape["dp"]
        params, batch_stats, opt_state = init_train_state(model, jax.random.PRNGKey(0), cfg, tx)
        params = jax.device_put(params, param_shardings(mesh, params))
        B = max(dp, 1)
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.standard_normal((B, cfg.num_cams, 3, cfg.img_h, cfg.img_w)).astype(np.float32),
            "can_bus": np.zeros((B, cfg.can_bus_dims), np.float32),
            "lidar2img": np.tile(np.eye(4, dtype=np.float32), (B, 1, cfg.num_cams, 1, 1)),
            "gt_boxes": np.zeros((B, 8, 9), np.float32),
            "gt_labels": np.zeros((B, 8), np.int32),
        }
        batch = jax.device_put(
            batch,
            jax.tree.map(lambda x: NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1)))), batch),
        )
        step = jax.jit(make_train_step(model, cfg.num_classes, tx))
        params, opt_state, m = step(params, batch_stats, opt_state, batch)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            params, opt_state, m = step(params, batch_stats, opt_state, batch)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        results[n] = {"sec_per_step": dt, "frames_per_sec": B / dt, "mesh": f"dp{dp}xtp{mesh.shape['tp']}"}
        print(f"n={n} ({results[n]['mesh']}): {dt*1e3:.0f} ms/step, {B/dt:.2f} frames/s", file=sys.stderr)

    base = min(results)
    for n, r in results.items():
        r["efficiency_vs_1"] = (r["frames_per_sec"] / results[base]["frames_per_sec"]) * (base / n)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
