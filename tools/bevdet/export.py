"""Export a deployable BEVDet artifact — the ".trt engine build" step.

Reference flow: tools/bevdet/pth2onnx.py (precomputes one real sample's
rank tensors from the camera rig, :60-97) -> tools/bevdet/onnx2trt.py
(builds the engine, :1-207).  Here one command produces the TPU-native
artifact directory:

  <out>/model.stablehlo   device-independent serialized forward with the
                          rig's rank tensors baked in as constants (the
                          reference bakes the same tensors into the engine)
  <out>/variables.msgpack params (+ batch_stats + folded int8 scales)
  <out>/meta.json         config name, dtype, quant mode, input shapes

Usage:
  python tools/bevdet/export.py --infos val.pkl --checkpoint ref.pth \
      [--quant-scales scales.msgpack --quant int8] --out checkpoints/bevdet_tpu
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
    ap.add_argument("--model", default="r50", choices=["r50", "micro"])
    ap.add_argument("--infos", required=True,
                    help="nuScenes infos pkl — the first frame's camera rig "
                    "defines the baked rank tensors (reference pth2onnx.py:60-97)")
    ap.add_argument("--checkpoint", default=None, help=".pth (reference) or .msgpack")
    ap.add_argument("--quant-scales", default=None)
    ap.add_argument("--quant", default="int8", choices=["qdq", "int8"])
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--ranks-pad", type=int, default=400000)
    ap.add_argument(
        "--pool-impl", default="interval", choices=["scatter", "interval"],
        help="bev_pool formulation baked into the artifact (ops/bev_pool.py)",
    )
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--aot", action="store_true",
        help="also AOT-compile for THIS chip (warms the persistent cache)",
    )
    args = ap.parse_args()

    import os
    import pickle

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.configs.bevdet import bevdet_micro, bevdet_r50
    from bevformer_tensorrt_tpu.models.detectors.bevdet import BEVDet
    from bevformer_tensorrt_tpu.models.necks.view_transformer import (
        get_lidar_coor,
        voxel_pooling_prepare,
    )
    from bevformer_tensorrt_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
    from bevformer_tensorrt_tpu.runtime.export import (
        aot_compile,
        enable_compilation_cache,
        export_serialized,
    )

    enable_compilation_cache()
    quant = False
    if args.quant_scales:
        quant = "int8" if args.quant == "int8" else True
    mk = bevdet_micro if args.model == "micro" else bevdet_r50
    cfg = mk(dtype=args.dtype, quant=quant)
    model = BEVDet(cfg)

    with open(args.infos, "rb") as f:
        infos = pickle.load(f)["infos"]
    cams = list(infos[0]["cams"].values())
    s2e = np.stack([
        np.block([
            [np.asarray(c["sensor2lidar_rotation"], np.float64),
             np.asarray(c["sensor2lidar_translation"], np.float64)[:, None]],
            [np.zeros((1, 3)), np.ones((1, 1))],
        ])
        for c in cams
    ]).astype(np.float32)
    intr = np.stack([np.asarray(c["cam_intrinsic"], np.float32) for c in cams])
    coor = get_lidar_coor(cfg, s2e, intr)
    use_iv = args.pool_impl == "interval"
    gz = int(round((cfg.grid_zbound[1] - cfg.grid_zbound[0]) / cfg.grid_zbound[2]))
    ranks = voxel_pooling_prepare(
        cfg, coor, pad_to=args.ranks_pad,
        pad_intervals_to=cfg.bev_h * cfg.bev_w * gz if use_iv else None,
    )
    rd = jnp.asarray(ranks.ranks_depth)
    rf = jnp.asarray(ranks.ranks_feat)
    rb = jnp.asarray(ranks.ranks_bev)
    iv = (
        (jnp.asarray(ranks.interval_starts), jnp.asarray(ranks.interval_lengths))
        if use_iv else (None, None)
    )

    image = jnp.zeros((1, cfg.num_cams, 3, cfg.input_h, cfg.input_w), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), image, rd, rf, rb, *iv)
    if args.checkpoint:
        from bevformer_tensorrt_tpu.runtime.torch_import import load_variables

        variables = load_variables(args.checkpoint, variables, family="bevdet", cfg=cfg)
    if args.quant_scales:
        scales = load_checkpoint(args.quant_scales)
        from bevformer_tensorrt_tpu.quant.fold import attach_quant_scales

        # re-fold int8 weights from THIS checkpoint's params (the scale
        # artifact's folded weights are stale for a QAT-finetuned model)
        variables = attach_quant_scales(variables, scales["quant"])

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # ranks baked as closure constants — the artifact's only inputs are
    # (variables, image), matching the reference engine whose rank tensors
    # are fixed at build time for one rig
    def forward(v, img):
        return model.apply(v, img, rd, rf, rb, *iv)

    export_serialized(forward, (variables, image), out / "model.stablehlo")
    save_checkpoint(str(out / "variables.msgpack"), variables)
    (out / "meta.json").write_text(
        json.dumps(
            {
                "model": f"bevdet_{args.model}",
                "dtype": args.dtype,
                "quant": args.quant if args.quant_scales else "none",
                "pool_impl": args.pool_impl,
                "image": list(image.shape),
                "ranks_pad": args.ranks_pad,
                "rig_infos": str(args.infos),
            },
            indent=1,
        )
    )
    if args.aot:
        aot_compile(forward, (variables, image))
        print("AOT compile done (persistent cache warm)", file=sys.stderr)
    sizes = {p.name: p.stat().st_size for p in out.iterdir()}
    print(json.dumps({
        "out": str(out), "artifacts": sizes,
        "artifact_mb": round(sum(sizes.values()) / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
