"""PTQ calibration for the 2D family (YOLOX / CenterNet).

TPU-native equivalent of tools/2d/post_training_quant.py in the reference:
N batches through the QDQ-instrumented model, two-pass entropy/percentile/
max scale selection, scale-dict checkpoint out.

Usage:
  python tools/2d/calibrate.py yolox_x --ann instances_val2017.json \
      --img-root val2017 --length 512 --method entropy --out scales.msgpack
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=["yolox_x", "yolox_s", "yolox_micro", "centernet_r18", "centernet_micro"])
    ap.add_argument("--ann", required=True)
    ap.add_argument("--img-root", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--length", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--method", default="percentile",
                    choices=["max", "percentile", "entropy"],
                    help="percentile-99.99 is the reference QDQ default and "
                    "the ABLATION_r4.json winner (entropy-KL collapses "
                    "long-tailed head activations)")
    ap.add_argument("--percentile", type=float, default=99.99)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    from bevformer_tensorrt_tpu.runtime.export import enable_compilation_cache

    enable_compilation_cache()  # persistent cache: skip remote recompiles
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.data.coco import CocoDataset
    from bevformer_tensorrt_tpu.quant.calibrate import calibrate
    from bevformer_tensorrt_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint

    if args.model.startswith("yolox"):
        from bevformer_tensorrt_tpu.configs import yolox as ycfg
        from bevformer_tensorrt_tpu.models.detectors.yolox import YOLOX

        cfg = getattr(ycfg, args.model)(quant=True)
        model = YOLOX(cfg)
        ds = CocoDataset(args.ann, args.img_root, img_size=cfg.img_size)
    else:
        from bevformer_tensorrt_tpu.configs import centernet as ccfg
        from bevformer_tensorrt_tpu.models.detectors.centernet import CenterNet

        # honor the requested tier (this used to hardcode centernet_r18)
        cfg = getattr(ccfg, args.model)(quant=True)
        model = CenterNet(cfg)
        ds = CocoDataset(
            args.ann, args.img_root, img_size=cfg.img_size,
            mean=(123.675, 116.28, 103.53), std=(58.395, 57.12, 57.375), to_rgb=True,
        )

    B = args.batch
    imgs0 = jnp.zeros((B, 3, cfg.img_size, cfg.img_size), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs0)
    if args.checkpoint:
        from bevformer_tensorrt_tpu.runtime.torch_import import load_variables

        family = "yolox" if args.model.startswith("yolox") else "centernet"
        variables = load_variables(args.checkpoint, variables, family=family, cfg=cfg)
        variables = jax.device_put(variables)  # pin on device: jit re-uploads host trees every call

    n = min(args.length, len(ds))
    batches = []
    for s in range(0, n, B):
        imgs = np.zeros((B, 3, cfg.img_size, cfg.img_size), np.float32)
        for i in range(s, min(s + B, n)):
            imgs[i - s] = ds.sample(i).image
        batches.append({"image": imgs})

    def apply_fn(v, batch, mutable):
        _, mutated = model.apply(v, jnp.asarray(batch["image"]), mutable=mutable)
        return mutated

    quant_vars, result = calibrate(
        apply_fn, variables, batches, method=args.method, percentile=args.percentile
    )
    from bevformer_tensorrt_tpu.quant.fold import fold_int8_weights

    # deploy artifact: fold per-channel int8 weights + scales next to
    # the activation scales so quant='int8' never re-quantizes weights
    quant_vars = {"quant": fold_int8_weights({**variables, **quant_vars})["quant"]}
    save_checkpoint(args.out, quant_vars)
    print(f"saved {len(result.scales)} scales -> {args.out}")


if __name__ == "__main__":
    main()
