"""PTQ calibration for BEVDet (entropy/percentile/max -> scale dict).

TPU-native analogue of the reference's BEVDet INT8 flow
(tools/bevdet/onnx2trt.py with calibrator).

Usage:
  python tools/bevdet/calibrate.py --infos val.pkl --data-root ... \
      --length 300 --method entropy --out bevdet_scales.msgpack
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="r50", choices=["r50", "micro"])
    ap.add_argument("--infos", required=True)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--length", type=int, default=300)
    ap.add_argument("--method", default="entropy", choices=["max", "percentile", "entropy"])
    ap.add_argument("--percentile", type=float, default=99.99)
    ap.add_argument("--ranks-pad", type=int, default=400000)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    from bevformer_tensorrt_tpu.runtime.export import enable_compilation_cache

    enable_compilation_cache()  # persistent cache: skip remote recompiles
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.configs.bevdet import bevdet_micro, bevdet_r50
    from bevformer_tensorrt_tpu.data.nuscenes import IMG_NORM_PYTORCH, NuScenesFrames
    from bevformer_tensorrt_tpu.models.detectors.bevdet import BEVDet
    from bevformer_tensorrt_tpu.models.necks.view_transformer import (
        get_lidar_coor,
        voxel_pooling_prepare,
    )
    from bevformer_tensorrt_tpu.quant.calibrate import calibrate
    from bevformer_tensorrt_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint

    mk = bevdet_micro if args.model == "micro" else bevdet_r50
    cfg = mk(quant=True)
    model = BEVDet(cfg)
    frames = NuScenesFrames(
        args.infos, args.data_root, img_norm=IMG_NORM_PYTORCH,
        target_hw=(cfg.input_h, cfg.input_w),
    )
    info0 = frames.infos[0]
    cams = list(info0["cams"].values())
    s2e = np.stack([
        np.block([
            [np.asarray(c["sensor2lidar_rotation"], np.float64),
             np.asarray(c["sensor2lidar_translation"], np.float64)[:, None]],
            [np.zeros((1, 3)), np.ones((1, 1))],
        ]) for c in cams
    ]).astype(np.float32)
    intr = np.stack([np.asarray(c["cam_intrinsic"], np.float32) for c in cams])
    ranks = voxel_pooling_prepare(cfg, get_lidar_coor(cfg, s2e, intr), pad_to=args.ranks_pad)
    rd, rf, rb = map(jnp.asarray, (ranks.ranks_depth, ranks.ranks_feat, ranks.ranks_bev))

    dummy = jnp.zeros((1, cfg.num_cams, 3, cfg.input_h, cfg.input_w), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, rd, rf, rb)
    if args.checkpoint:
        from bevformer_tensorrt_tpu.runtime.torch_import import load_variables

        variables = load_variables(args.checkpoint, variables, family="bevdet", cfg=cfg)
        variables = jax.device_put(variables)  # pin on device: jit re-uploads host trees every call

    n = min(args.length, len(frames))
    batches = [{"image": frames.frame(i).image} for i in range(n)]

    def apply_fn(v, batch, mutable):
        _, mutated = model.apply(v, jnp.asarray(batch["image"]), rd, rf, rb, mutable=mutable)
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
