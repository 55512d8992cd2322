"""Post-training quantization: calibrate BEVFormer and emit a scale-dict.

TPU-native equivalent of tools/bevformer/onnx2trt.py --int8: runs an FP32
pre-pass over N frames to record realistic recurrent prev_bev/use_prev_bev/
can_bus calibration state (the reference does the same through a FP32
engine, onnx2trt.py:168-241), then two-pass entropy/percentile/max
calibration through the QDQ sites, saving {"quant": scales} as the artifact
(the ".trt engine" analogue is this checkpoint + the JAX compilation cache).

Usage:
  python tools/bevformer/calibrate.py tiny --infos val.pkl --data-root ... \
      --length 500 --method percentile --out scales.msgpack
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=["micro", "tiny", "small", "base"])
    ap.add_argument("--infos", required=True)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--length", type=int, default=500, help="calibration frames")
    ap.add_argument(
        "--method", default="percentile",
        choices=["max", "percentile", "entropy"],
        help="percentile-99.99 is the reference QDQ default "
        "(calibrator_qdq.py:76) and the ABLATION_r4.json winner: entropy-KL "
        "scales collapse the detection head (NDS -0.061 vs -0.000)",
    )
    ap.add_argument(
        "--also-methods", default=None,
        help="comma list of extra methods: the stats passes are method-"
        "independent, so additional scale-dicts cost no device time; each is "
        "written next to --out with a .<method> suffix",
    )
    ap.add_argument("--percentile", type=float, default=99.99)
    ap.add_argument(
        "--exclude", action="append", default=None,
        help="mixed-precision site pattern kept in fp (repeatable; persisted "
        "into the artifact so evaluate/export pick it up — the reference's "
        "INT8+FP16 dual-flag behavior, onnx2tensorrt.py:49-54)",
    )
    ap.add_argument("--save-stats", default=None,
                    help="also save raw amax+hist stats (npz) for offline analysis")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    from bevformer_tensorrt_tpu.runtime.export import enable_compilation_cache

    enable_compilation_cache()  # persistent cache: skip remote recompiles
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.configs import bevformer as cfgs
    from bevformer_tensorrt_tpu.data.nuscenes import (
        IMG_NORM_CAFFE,
        IMG_NORM_PYTORCH,
        NuScenesFrames,
    )
    from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer
    from flax import traverse_util
    from bevformer_tensorrt_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
    from bevformer_tensorrt_tpu.runtime.engine import BEVFormerEngine

    cfg_fp = getattr(cfgs, f"bevformer_{args.model}")(quant=False)
    cfg_q = getattr(cfgs, f"bevformer_{args.model}")(quant=True)
    norm = IMG_NORM_PYTORCH if args.model == "tiny" else IMG_NORM_CAFFE
    frames = NuScenesFrames(
        args.infos, args.data_root, img_norm=norm, target_hw=(cfg_fp.img_h, cfg_fp.img_w)
    )
    n = min(args.length, len(frames))

    model_fp = BEVFormer(cfg_fp)
    nq = cfg_fp.bev_h * cfg_fp.bev_w
    dummy = (
        jnp.zeros((1, cfg_fp.num_cams, 3, cfg_fp.img_h, cfg_fp.img_w), jnp.float32),
        jnp.zeros((nq, 1, cfg_fp.embed_dims), jnp.float32),
        jnp.float32(0.0),
        jnp.zeros(cfg_fp.can_bus_dims, jnp.float32),
        jnp.zeros((1, cfg_fp.num_cams, 4, 4), jnp.float32),
    )
    variables = jax.jit(model_fp.init)(jax.random.PRNGKey(0), *dummy)
    if args.checkpoint:
        from bevformer_tensorrt_tpu.runtime.torch_import import load_variables

        variables = load_variables(args.checkpoint, variables, family="bevformer", cfg=cfg_fp)

    # FP32 pre-pass: record realistic recurrent state per calibration frame
    print(f"pre-pass: {n} frames", file=sys.stderr)
    engine = BEVFormerEngine(model_fp, variables, cfg_fp, donate_prev_bev=False)
    batches = []
    for i in range(n):
        f = frames.frame(i)
        delta_can_bus, use_prev = engine.state.step_can_bus(f.can_bus, f.scene_token)
        prev_bev = (
            engine.state.prev_bev
            if engine.state.prev_bev is not None
            else jnp.zeros((nq, 1, cfg_fp.embed_dims), jnp.float32)
        )
        batches.append(
            dict(
                image=f.image,
                prev_bev=np.asarray(prev_bev),
                use_prev_bev=np.float32(use_prev),
                can_bus=delta_can_bus,
                lidar2img=f.lidar2img,
            )
        )
        bev_embed, _, _ = engine._apply(
            variables, f.image, prev_bev, jnp.float32(use_prev), jnp.asarray(delta_can_bus), f.lidar2img
        )
        engine.state.prev_bev = bev_embed

    # calibration passes through the QDQ-instrumented model
    model_q = BEVFormer(cfg_q)
    variables_q = jax.jit(model_q.init)(jax.random.PRNGKey(0), *dummy)
    variables_q = jax.device_put(
        {**variables_q, "params": variables["params"], "batch_stats": variables["batch_stats"]}
    )  # pin on device: jit re-uploads host trees every call

    def apply_fn(v, batch, mutable):
        _, mutated = model_q.apply(
            v,
            batch["image"],
            batch["prev_bev"],
            batch["use_prev_bev"],
            batch["can_bus"],
            batch["lidar2img"],
            mutable=mutable,
        )
        return mutated

    methods = [args.method] + (
        [m for m in args.also_methods.split(",") if m] if args.also_methods else []
    )
    print(f"calibration: methods={methods}", file=sys.stderr)
    from bevformer_tensorrt_tpu.quant.calibrate import collect_stats, scales_from_stats

    amax_stats, hist_stats = collect_stats(
        apply_fn, variables_q, batches, with_hist=methods != ["max"]
    )
    if args.save_stats:
        flat_a = {
            "amax/" + "/".join(p[:-1]): np.asarray(v)
            for p, v in traverse_util.flatten_dict(amax_stats).items()
        }
        flat_h = {
            "hist/" + "/".join(p[:-1]): np.asarray(v)
            for p, v in traverse_util.flatten_dict(hist_stats).items()
        }
        np.savez(args.save_stats, **flat_a, **flat_h)
        print(f"saved raw stats -> {args.save_stats}", file=sys.stderr)

    from bevformer_tensorrt_tpu.quant.fold import fold_int8_weights
    from bevformer_tensorrt_tpu.quant.policy import save_policy

    for mi, method in enumerate(methods):
        quant_vars, result = scales_from_stats(
            amax_stats, hist_stats, method=method, percentile=args.percentile
        )
        # deploy artifact: fold per-channel int8 weights + scales next to
        # the activation scales so quant='int8' never re-quantizes weights
        quant_vars = {"quant": fold_int8_weights({**variables_q, **quant_vars})["quant"]}
        out = args.out if mi == 0 else f"{args.out}.{method}"
        save_checkpoint(out, quant_vars)
        save_policy(out, exclude=args.exclude or (), method=method)
        print(f"saved {len(result.scales)} scales ({method}) -> {out}")


if __name__ == "__main__":
    main()
