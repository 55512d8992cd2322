"""Export a deployable 2D-detector artifact (YOLOX / CenterNet).

Reference flow: tools/pth2onnx.py -> tools/2d/onnx2trt.py (:1-107, batch-N
optimization profile).  Here one command produces the TPU-native artifact
directory:

  <out>/model.stablehlo   device-independent serialized batch-N forward
  <out>/variables.msgpack params (+ batch_stats + folded int8 scales)
  <out>/meta.json         config name, dtype, quant mode, input shape

Usage:
  python tools/2d/export.py yolox_x --checkpoint ref.pth --batch 32 \
      [--quant-scales scales.msgpack --quant int8] --out checkpoints/yolox_tpu
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=[
        "yolox_x", "yolox_s", "yolox_micro", "centernet_r18", "centernet_micro",
    ])
    ap.add_argument("--checkpoint", default=None, help=".pth (reference) or .msgpack")
    ap.add_argument("--quant-scales", default=None)
    ap.add_argument("--quant", default="int8", choices=["qdq", "int8"])
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--batch", type=int, default=32,
                    help="baked batch size (reference builds batch-32 engines, "
                    "configs/yolox/yolox_x_8x8_300e_coco_trt.py:32-44)")
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--aot", action="store_true",
        help="also AOT-compile for THIS chip (warms the persistent cache)",
    )
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp

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

    if args.model.startswith("yolox"):
        from bevformer_tensorrt_tpu.configs import yolox as ycfg
        from bevformer_tensorrt_tpu.models.detectors.yolox import YOLOX

        cfg = getattr(ycfg, args.model)(dtype=args.dtype, quant=quant)
        model = YOLOX(cfg)
        family = "yolox"
    else:
        from bevformer_tensorrt_tpu.configs.centernet import centernet_micro, centernet_r18
        from bevformer_tensorrt_tpu.models.detectors.centernet import CenterNet

        mk = centernet_micro if args.model == "centernet_micro" else centernet_r18
        cfg = mk(dtype=args.dtype, quant=quant)
        model = CenterNet(cfg)
        family = "centernet"

    imgs = jnp.zeros((args.batch, 3, cfg.img_size, cfg.img_size), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
    if args.checkpoint:
        from bevformer_tensorrt_tpu.runtime.torch_import import load_variables

        variables = load_variables(args.checkpoint, variables, family=family, cfg=cfg)
    if args.quant_scales:
        scales = load_checkpoint(args.quant_scales)
        from bevformer_tensorrt_tpu.quant.fold import attach_quant_scales

        # re-fold int8 weights from THIS checkpoint's params (the scale
        # artifact's folded weights are stale for a QAT-finetuned model)
        variables = attach_quant_scales(variables, scales["quant"])

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    def forward(v, img):
        return model.apply(v, img)

    export_serialized(forward, (variables, imgs), out / "model.stablehlo")
    save_checkpoint(str(out / "variables.msgpack"), variables)
    (out / "meta.json").write_text(
        json.dumps(
            {
                "model": args.model,
                "dtype": args.dtype,
                "quant": args.quant if args.quant_scales else "none",
                "image": list(imgs.shape),
            },
            indent=1,
        )
    )
    if args.aot:
        aot_compile(forward, (variables, imgs))
        print("AOT compile done (persistent cache warm)", file=sys.stderr)
    sizes = {p.name: p.stat().st_size for p in out.iterdir()}
    print(json.dumps({
        "out": str(out), "artifacts": sizes,
        "artifact_mb": round(sum(sizes.values()) / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
