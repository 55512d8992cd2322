"""Export a deployable BEVFormer artifact — the ".trt engine build" step.

Reference flow: pth2onnx.sh -> onnx2trt.sh produce checkpoints/tensorrt/
*.trt (convert/pytorch2onnx.py + convert/onnx2tensorrt.py).  Here one
command produces the TPU-native artifact directory:

  <out>/model.stablehlo   device-independent serialized forward
                          (jax.export; reload-and-jit anywhere)
  <out>/variables.msgpack params (+ batch_stats + folded int8 scales)
  <out>/meta.json         config name, dtype, quant mode, input shapes

plus a warm persistent compilation cache when run on the target chip
(runtime/export.py enable_compilation_cache — the between-process analogue
of the serialized engine plan).

Usage:
  python tools/bevformer/export.py base --checkpoint ref.pth \
      [--quant-scales scales.msgpack --quant int8] --out checkpoints/base_tpu
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=["micro", "tiny", "small", "base"])
    ap.add_argument("--checkpoint", default=None, help=".pth (reference) or .msgpack")
    ap.add_argument("--quant-scales", default=None)
    ap.add_argument("--quant", default="int8", choices=["qdq", "int8"])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--aot", action="store_true",
        help="also AOT-compile for THIS chip (warms the persistent cache)",
    )
    ap.add_argument(
        "--autotune", action="store_true",
        help="sweep the sorted-MSDA kernel-layout knob grid at the deploy "
        "shapes on THIS chip and bake + persist the winner (knobs.json) — "
        "the reference's build-time cuBLAS algo search serialized into the "
        "engine (multiHeadAttnPlugin.cpp:246-335)",
    )
    ap.add_argument("--autotune-iters", type=int, default=5)
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.configs import bevformer as cfgs
    from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer
    from bevformer_tensorrt_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
    from bevformer_tensorrt_tpu.runtime.export import (
        aot_compile,
        enable_compilation_cache,
        export_serialized,
    )
    from bevformer_tensorrt_tpu.runtime.torch_import import load_variables

    enable_compilation_cache()
    quant = False
    if args.quant_scales:
        quant = "int8" if args.quant == "int8" else True
    cfg = getattr(cfgs, f"bevformer_{args.model}")(dtype=args.dtype, quant=quant)
    model = BEVFormer(cfg)
    nq = cfg.bev_h * cfg.bev_w

    ex_args = (
        jnp.zeros((1, cfg.num_cams, 3, cfg.img_h, cfg.img_w), jnp.float32),
        jnp.zeros((nq, 1, cfg.embed_dims), jnp.float32),
        jnp.float32(1.0),
        jnp.zeros(cfg.can_bus_dims, jnp.float32),
        jnp.zeros((1, cfg.num_cams, 4, 4), jnp.float32),
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *ex_args)
    if args.checkpoint:
        variables = load_variables(args.checkpoint, variables, family="bevformer", cfg=cfg)
    if args.quant_scales:
        scales = load_checkpoint(args.quant_scales)
        from bevformer_tensorrt_tpu.quant.fold import attach_quant_scales

        # re-fold int8 weights from THIS checkpoint's params (the scale
        # artifact's folded weights are stale for a QAT-finetuned model)
        variables = attach_quant_scales(variables, scales["quant"])

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    def forward(v, image, prev_bev, use_prev, can_bus, l2i):
        return model.apply(v, image, prev_bev, use_prev, can_bus, l2i)

    if args.autotune:
        # build-time kernel-layout search at the REAL deploy shapes; the
        # winner is applied to the env (trace-time channel) so the StableHLO
        # and AOT artifacts below bake the tuned layout, and persisted as
        # knobs.json for tools that re-trace (runtime/autotune.py docstring)
        import time

        from bevformer_tensorrt_tpu.runtime.autotune import (
            apply_knobs,
            autotune,
            save_knobs,
        )

        dev_vars = jax.device_put(variables)

        def bench_once(knobs):
            apply_knobs(knobs)
            jax.clear_caches()
            f = jax.jit(forward)
            o = f(dev_vars, *ex_args)
            jax.block_until_ready(o)  # compile + first run
            ts = []
            for _ in range(args.autotune_iters):
                t0 = time.perf_counter()
                o = f(dev_vars, *ex_args)
                # force real readback (tunneled backends ack early)
                np.asarray(jax.tree.leaves(o)[-1].ravel()[0])
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        result = autotune(bench_once)
        apply_knobs(result["knobs"])
        jax.clear_caches()
        save_knobs(out, result)
        print(f"autotune winner: {result['knobs']} "
              f"({result['seconds'] * 1e3:.1f} ms/frame)", file=sys.stderr)

    export_serialized(forward, (variables, *ex_args), out / "model.stablehlo")
    save_checkpoint(str(out / "variables.msgpack"), variables)
    (out / "meta.json").write_text(
        json.dumps(
            {
                "model": args.model,
                "dtype": args.dtype,
                "quant": args.quant if args.quant_scales else "none",
                "image": list(ex_args[0].shape),
                "prev_bev": list(ex_args[1].shape),
                "lidar2img": list(ex_args[4].shape),
            },
            indent=1,
        )
    )
    if args.aot:
        aot_compile(forward, (variables, *ex_args))
        print("AOT compile done (persistent cache warm)", file=sys.stderr)
    sizes = {p.name: p.stat().st_size for p in out.iterdir()}
    # the reference's Size(MB) column (README.md:53-65): total engine
    # artifact bytes — here the StableHLO graph + weights + metadata
    print(json.dumps({
        "out": str(out),
        "artifacts": sizes,
        "artifact_mb": round(sum(sizes.values()) / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
