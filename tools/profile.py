"""Capture a jax.profiler trace of N inference frames.

The reference's profiling story is stream-sync latency timing + TRT
DETAILED verbosity (SURVEY.md §5); here the full XLA trace (per-fusion
timing, HBM traffic) lands in a TensorBoard-compatible directory.

Usage: python tools/profile.py [tiny|base] --out /tmp/trace [--frames 3]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="tiny")
    ap.add_argument("--out", default="/tmp/jax-trace")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quant", default="none", choices=["none", "int8"],
                    help="int8: trace the real-int8 deploy path (max-calibrated"
                    " scales from one batch, folded weights — as bench.py)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.configs import bevformer as cfgs
    from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer

    quant = "int8" if args.quant == "int8" else False
    cfg = getattr(cfgs, f"bevformer_{args.model}")(dtype=args.dtype, quant=quant)
    model = BEVFormer(cfg)
    nq = cfg.bev_h * cfg.bev_w
    rng = np.random.default_rng(0)
    # realistic 6-cam rig, matching bench.py: gather-kernel behavior depends
    # on per-camera visibility, so an identity rig skews the trace
    from tools.geometry_analysis import nuscenes_like_rig

    l2i = nuscenes_like_rig(cfg.img_w, cfg.img_h)[: cfg.num_cams]
    inputs = (
        jnp.asarray(rng.standard_normal((1, cfg.num_cams, 3, cfg.img_h, cfg.img_w)), jnp.float32),
        jnp.zeros((nq, 1, cfg.embed_dims), jnp.float32),
        jnp.float32(1.0),
        jnp.zeros(cfg.can_bus_dims, jnp.float32),
        jnp.asarray(l2i.reshape(1, cfg.num_cams, 4, 4).astype(np.float32)),
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs)
    if quant:
        # one-batch max calibration + folded int8 weights (bench.py parity)
        from flax import traverse_util

        from bevformer_tensorrt_tpu.quant.fold import fold_int8_weights

        _, mut = jax.jit(lambda v, *a: model.apply(v, *a, mutable=["amax_stats"]))(
            variables, *inputs
        )
        flat = traverse_util.flatten_dict(
            jax.tree.map(lambda a: jnp.maximum(a, 1e-6) / 127.0, mut["amax_stats"])
        )
        flat = {p[:-1] + ("scale",): v for p, v in flat.items()}
        variables = {**variables, "quant": traverse_util.unflatten_dict(flat)}
        variables = fold_int8_weights(variables)
    fn = jax.jit(lambda v, *a: model.apply(v, *a))
    out = fn(variables, *inputs)  # compile outside the trace
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])

    with jax.profiler.trace(args.out):
        for _ in range(args.frames):
            out = fn(variables, *inputs)
            np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    print(f"trace -> {args.out} (tensorboard --logdir {args.out})")


if __name__ == "__main__":
    main()
